"""themis_search_engine_ray — Ray-Data-native full-text index + BM25
engine with training-data pipeline operators. See README.md."""

def _tune_malloc() -> None:
    """Keep large allocations on the heap instead of per-allocation mmap.

    glibc malloc mmap()s every allocation above ~128 KiB and munmap()s it
    on free, so each numpy temporary above that size page-faults its
    entire extent on first touch. On hosts with slow page faults
    (virtualized EPT; this sandbox measures ~40 µs/page) that turns
    bandwidth-bound kernels into fault-bound ones — measured 0.07 GB/s
    vs 4+ GB/s per process for plain ``np.arange`` (tools/membus_probe.py
    and NOTES.md). Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes the
    heap retain and reuse those extents (pages fault once per worker,
    not once per allocation). Runs in every process that imports this
    package — the driver and every Ray worker executing our UDFs.
    Trade-off: freed heap is not returned to the OS, so worker RSS holds
    at its high-water mark (bounded by per-task working sets).
    """
    import ctypes
    import os

    if os.environ.get("THEMIS_NO_MALLOC_TUNE"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform: default allocator behavior


_tune_malloc()
