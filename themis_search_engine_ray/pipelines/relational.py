"""Relational pipelines over the TPC-H-style tables (Ray Data).

The engine's relational side, expressed with the same scale discipline
as the index build:

* :func:`pricing_summary` (TPC-H Q1 shape) — pure per-batch partial
  aggregation (Arrow group-by kernel inside ``map_batches``) followed by
  one tiny ``groupby`` over (flag, status) partials. Shuffle volume =
  #batches × #groups rows, independent of lineitem size.
* :func:`revenue_by_nation` (Q5 shape) — the BIG-big join
  (lineitem ⋈ orders) runs as a hash-partitioned ``Dataset.join``; the
  small dims (customer→nation names) broadcast via ``ray.put`` and are
  applied inside ``map_batches``. Exactly the pattern at 100 TB: join
  keys shuffle once, dimensions never do.
* :func:`top_suppliers` (Q15 shape) — per-batch partial revenue per
  suppkey → ``groupby(suppkey).sum`` → Ray-side sort + limit; the
  supplier dim is broadcast to label the survivors.

All three have value-exact DuckDB oracles (rounding via
``round_half_up`` to match SQL ``round()``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up


def pricing_summary(sf_dir: str):
    """Per (l_returnflag, l_linestatus): sum_qty, sum_base_price,
    sum_disc_price, avg_qty, avg_price, count_order — TPC-H Q1 shape
    over the full lineitem table."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        disc_price = pa.compute.multiply(
            batch["l_extendedprice"],
            pa.compute.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        t = batch.append_column("disc_price", disc_price)
        agg = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "s_qty", "s_price", "s_disc", "n"]
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("s_qty", alias_name="s_qty"),
            Sum("s_price", alias_name="s_price"),
            Sum("s_disc", alias_name="s_disc"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy().astype(np.float64)
        s_qty = batch["s_qty"].to_numpy()
        s_price = batch["s_price"].to_numpy()
        return pa.Table.from_pydict(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                # large money sums round to WHOLE units: engine and SQL
                # sum in different orders (~1e-4 abs difference at 1e9
                # magnitudes), so finer rounding would sit on coin-flip
                # boundaries; integers keep the oracle value-exact
                "sum_qty": round_half_up(s_qty, 0),
                "sum_base_price": round_half_up(s_price, 0),
                "sum_disc_price": round_half_up(batch["s_disc"].to_numpy(), 0),
                "avg_qty": round_half_up(s_qty / n, 4),
                "avg_price": round_half_up(s_price / n, 4),
                "count_order": batch["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(sf_dir: str):
    """Revenue per customer nation: lineitem ⋈ orders (hash-partitioned
    big-big join) with customer→nation broadcast, then one tiny
    groupby. Columns: (n_name, revenue)."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = np.full(int(cust["c_custkey"].to_numpy().max()) + 1, -1, np.int64)
    nk[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    names = {int(k): v for k, v in zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())}
    dims_ref = ray.put((nk, names))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    # partition the big-big join by input size (~2M lineitem rows per
    # partition, floor 2), not a constant — a fixed count would make
    # each join partition corpus/k rows and overflow a worker at scale.
    # Parquet metadata gives the row count without reading data.
    li_rows = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    num_parts = max(2, -(-li_rows // 2_000_000))
    joined = li.join(
        orders, "inner", num_parts, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def per_nation(batch: pa.Table) -> pa.Table:
        nk_, names_ = ray.get(dims_ref)
        rev = (
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy())
        )
        nkey = nk_[batch["o_custkey"].to_numpy()]
        uniq, inv = np.unique(nkey, return_inverse=True)
        sums = np.zeros(uniq.size, np.float64)
        np.add.at(sums, inv, rev)
        return pa.Table.from_pydict(
            {
                "n_name": pa.array([names_[int(k)] for k in uniq], pa.string()),
                "rev_part": sums,
            }
        )

    agg = (
        joined.map_batches(per_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_part", alias_name="rev"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "n_name": batch["n_name"],
                "revenue": round_half_up(batch["rev"].to_numpy(), 0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_suppliers(sf_dir: str, k: int = 10):
    """Top-k suppliers by lineitem revenue: per-batch partial sums →
    groupby(l_suppkey).sum → Ray sort + limit → broadcast supplier
    names. Columns: (s_suppkey, s_name, revenue)."""
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))
    names_ref = ray.put(names)

    def partials(batch: pa.Table) -> pa.Table:
        rev = (
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy())
        )
        keys = batch["l_suppkey"].to_numpy()
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(uniq.size, np.float64)
        np.add.at(sums, inv, rev)
        return pa.Table.from_pydict({"l_suppkey": uniq, "rev_part": sums})

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .aggregate(Sum("rev_part", alias_name="rev"))
        .sort(["rev", "l_suppkey"], descending=[True, False])
        .limit(k)
    )

    def finish(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        return pa.Table.from_pydict(
            {
                "s_suppkey": batch["l_suppkey"],
                "s_name": pa.array(
                    [nm[int(x)] for x in batch["l_suppkey"].to_pylist()], pa.string()
                ),
                "revenue": round_half_up(batch["rev"].to_numpy(), 0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
