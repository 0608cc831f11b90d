"""Engine-portable 16-bit md5-slice hash expressions.

One definition of the Spark/DuckDB twin pair used across the dedup /
selection family (winnowing, DSIR, streaming LSH; textops3's Bloom filter
predates this helper and keeps its local copy): a 4-hex-digit slice of
md5(x) at 1-based offset ``off``, decoded to a BIGINT in [0, 65536).  The
two spellings are value-identical because md5 hex output is identical in
both engines and both decodes are plain base-16 positional arithmetic.
"""

from __future__ import annotations


def spark_md5_slice(col: str, off: int = 1) -> str:
    """Spark SQL: 16-bit integer from md5(col) hex digits [off, off+3]."""
    return f"CAST(conv(substring(md5({col}), {off}, 4), 16, 10) AS BIGINT)"


def duck_md5_slice(col: str, off: int = 1) -> str:
    """DuckDB SQL twin of :func:`spark_md5_slice` (digit-by-digit strpos)."""
    digit = (
        lambda p: f"(strpos('0123456789abcdef', substr(md5({col}), {p}, 1)) - 1)"
    )
    return (
        f"({digit(off)} * 4096 + {digit(off + 1)} * 256"
        f" + {digit(off + 2)} * 16 + {digit(off + 3)})"
    )
