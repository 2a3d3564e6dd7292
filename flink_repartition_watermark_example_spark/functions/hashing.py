"""Cross-engine deterministic hashing.

The dedup family (minhash, LSH banding, simhash) needs a hash function
that produces IDENTICAL values in Spark and in the DuckDB oracle, or
the driver's value-hash comparison can never match.  Spark's
``xxhash64``/``hash`` have no DuckDB twin, so we standardize on
**md5 → first 15 hex digits → bigint** (60 bits, always positive):

  Spark : conv(substr(md5(x), 1, 15), 16, 10)::long
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

Verified equal on both engines (e.g. 'hello' → 419982666956583591).
md5 is ~3× slower than xxhash64 but still JVM-side and vectorizable;
for pure-Spark paths where no oracle is involved, prefer xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, salt: str | None = None) -> Column:
    """60-bit deterministic hash of a string column, oracle-compatible.

    ``salt`` derives independent hash families (minhash permutations):
    the salted input is ``value || '#' || salt``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit("#" + salt))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB rendering of :func:`md5_long` over SQL expression
    ``expr`` — keep in lockstep with the Spark side."""
    if salt is not None:
        expr = f"({expr} || '#{salt}')"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# --- universal hash family over a 30-bit base hash -----------------------
#
# K independent hash functions as h_k(x) = (a_k·h(x) + b_k) mod P with
# h(x) the md5-based hash masked to 30 bits.  One md5 per input instead
# of K (md5+conv dominates minhash cost ~50×); all arithmetic stays
# below 2^61 so Spark (wrapping) and DuckDB (overflow-checking) BIGINT
# behave identically.

MERSENNE_P = (1 << 31) - 1
_MASK30 = (1 << 30) - 1


def _perm_seed(kind: str, k: int) -> int:
    import hashlib as _hl

    h = int(_hl.md5(f"minhash-{kind}-{k}".encode()).hexdigest()[:15], 16)
    return (h & _MASK30) | 1  # odd, nonzero


def perm_coeffs(num_perms: int) -> tuple[list[int], list[int]]:
    return (
        [_perm_seed("a", k) for k in range(num_perms)],
        [_perm_seed("b", k) for k in range(num_perms)],
    )


def md5_long30(col: Column | str) -> Column:
    return md5_long(col).bitwiseAND(F.lit(_MASK30))


def md5_long30_sql(expr: str) -> str:
    return f"({md5_long_sql(expr)} & {_MASK30})"
