"""Porter stemmer, faithful to the classic tartarus "Release 4" algorithm.

Behavioral parity target: the reference engine's Porter implementation
(``themis/lexicalAnalysis/stemmer/english/PorterStemmer.java:75-626`` in
/root/reference, itself the public-domain tartarus.org Java version of

    Porter, 1980, "An algorithm for suffix stripping", Program 14(3).

This module is a fresh Python implementation of that public algorithm,
including the Release-4 behaviors that differ from some other Porter
variants (e.g. NLTK's Porter2/Snowball), because index/query conformance
depends on byte-exact stems:

* words of length <= 2 are returned unchanged (``stem()`` guard ``k > 1``,
  PorterStemmer.java:614),
* the ``j`` cursor is only updated by a successful ``ends()`` match
  (PorterStemmer.java:248-261) — stale-``j`` semantics are preserved,
* step ordering and every suffix table entry match the Java step1-step6
  (classic steps 1a/1b/1c/2/3/4/5ab) exactly.

The dispatch wrapper (``stem_token``) mirrors
``themis/lexicalAnalysis/stemmer/Stemmer.java:47-73``: Greek-range first
characters (U+0370..U+03FF) pass through, printable-ASCII first characters
go to Porter, anything else passes through.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


@lru_cache(maxsize=1 << 20)
def porter_stem(word: str) -> str:
    """Stem a single lowercase token. Pure, deterministic, cached."""
    k = len(word) - 1
    if k <= 1:  # stem() applies steps only when k > 1
        return word
    b = list(word)
    # j is a cursor shared across helpers, updated only on an ends() match.
    j = 0

    def cons(i: int) -> bool:
        c = b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return i == 0 or not cons(i - 1)
        return True

    def m() -> int:
        # number of consonant-vowel sequences in b[0..j]
        n = 0
        i = 0
        while True:
            if i > j:
                return n
            if not cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem() -> bool:
        for i in range(j + 1):
            if not cons(i):
                return True
        return False

    def doublec(jj: int) -> bool:
        if jj < 1:
            return False
        if b[jj] != b[jj - 1]:
            return False
        return cons(jj)

    def cvc(i: int) -> bool:
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in "wxy"

    def ends(s: str) -> bool:
        nonlocal j
        l = len(s)
        o = k - l + 1
        if o < 0:
            return False
        for idx in range(l):
            if b[o + idx] != s[idx]:
                return False
        j = k - l
        return True

    def setto(s: str) -> None:
        nonlocal k
        o = j + 1
        for idx, ch in enumerate(s):
            p = o + idx
            if p < len(b):
                b[p] = ch
            else:
                b.append(ch)
        k = j + len(s)

    def r(s: str) -> None:
        if m() > 0:
            setto(s)

    def step1() -> None:
        nonlocal k
        if b[k] == "s":
            if ends("sses"):
                k -= 2
            elif ends("ies"):
                setto("i")
            elif b[k - 1] != "s":
                k -= 1
        if ends("eed"):
            if m() > 0:
                k -= 1
        elif (ends("ed") or ends("ing")) and vowelinstem():
            k = j
            if ends("at"):
                setto("ate")
            elif ends("bl"):
                setto("ble")
            elif ends("iz"):
                setto("ize")
            elif doublec(k):
                k -= 1
                if b[k] in ("l", "s", "z"):
                    k += 1
            elif m() == 1 and cvc(k):
                setto("e")

    def step2() -> None:
        if ends("y") and vowelinstem():
            b[k] = "i"

    def step3() -> None:
        if k == 0:
            return
        c = b[k - 1]
        if c == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c == "e":
            if ends("izer"):
                r("ize")
        elif c == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c == "g":
            if ends("logi"):
                r("log")

    def step4() -> None:
        c = b[k]
        if c == "e":
            if ends("icate"):
                r("ic")
            elif ends("ative"):
                r("")
            elif ends("alize"):
                r("al")
        elif c == "i":
            if ends("iciti"):
                r("ic")
        elif c == "l":
            if ends("ical"):
                r("ic")
            elif ends("ful"):
                r("")
        elif c == "s":
            if ends("ness"):
                r("")

    def step5() -> None:
        nonlocal k
        if k == 0:
            return
        c = b[k - 1]
        if c == "a":
            if not ends("al"):
                return
        elif c == "c":
            if not ends("ance") and not ends("ence"):
                return
        elif c == "e":
            if not ends("er"):
                return
        elif c == "i":
            if not ends("ic"):
                return
        elif c == "l":
            if not ends("able") and not ends("ible"):
                return
        elif c == "n":
            if (
                not ends("ant")
                and not ends("ement")
                and not ends("ment")
                and not ends("ent")
            ):
                return
        elif c == "o":
            if not (ends("ion") and j >= 0 and b[j] in ("s", "t")) and not ends("ou"):
                return
        elif c == "s":
            if not ends("ism"):
                return
        elif c == "t":
            if not ends("ate") and not ends("iti"):
                return
        elif c == "u":
            if not ends("ous"):
                return
        elif c == "v":
            if not ends("ive"):
                return
        elif c == "z":
            if not ends("ize"):
                return
        else:
            return
        if m() > 1:
            k = j

    def step6() -> None:
        nonlocal j, k
        j = k
        if b[k] == "e":
            a = m()
            if a > 1 or (a == 1 and not cvc(k - 1)):
                k -= 1
        if b[k] == "l" and doublec(k) and m() > 1:
            k -= 1

    step1()
    step2()
    step3()
    step4()
    step5()
    step6()
    return "".join(b[: k + 1])


def stem_token(token: str) -> str:
    """Language-dispatch stem, mirroring ``Stemmer.Stem`` (Stemmer.java:47-73).

    ``trim().toLowerCase()`` first; Greek-range (U+0370-U+03FF) first char →
    passthrough; printable ASCII (0x21-0x7E) first char → Porter; other →
    passthrough.
    """
    token = token.strip().lower()
    if not token:
        return token
    c = ord(token[0])
    if 0x0370 <= c <= 0x03FF:
        return token
    if 0x21 <= c <= 0x7E:
        return porter_stem(token)
    return token
