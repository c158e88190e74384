"""Shared DuckDB view construction over the driver's testdata parquet.

One definition of the oracle-side ``<dir>@xN`` amplification, used by
BOTH tools that run DuckDB against the testdata (tools/diffcheck.py and
tools/oracle_ratio.py). The remap here must mirror
``catalog.load_table``'s Spark-side amplification EXACTLY — entity
tables get key-offset replicas (N× distinct docs/vectors/users, see
catalog._SCALE_KEY_REMAP for why raw duplication is untestable),
lineitem gets raw N-fold listing, dims stay 1× — or a differential/
ratio run would silently compare the two engines on different inputs.
That correctness-grade coupling is why this lives in one module
instead of two verbatim copies (round-13 review finding).
"""

from __future__ import annotations


def create_testdata_views(con, sf_dir: str) -> None:
    """CREATE VIEW for every testdata table on ``con``, honoring
    ``<dir>@xN`` amplification. ``con`` is a live duckdb connection."""
    from ..catalog import _resolve_sf_dir, _SCALE_KEY_REMAP, _SCALE_STRIDE
    from ..schemas import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        base, n = _resolve_sf_dir(sf_dir, t)
        if n > 1 and t in _SCALE_KEY_REMAP:
            repl = ", ".join(
                f"{c} + _rep.range * {_SCALE_STRIDE} AS {c}"
                for c in _SCALE_KEY_REMAP[t]
            )
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * EXCLUDE (range) REPLACE ({repl}) "
                f"FROM read_parquet('{base}/{t}.parquet'), range({n}) _rep"
            )
        else:
            files = ", ".join([f"'{base}/{t}.parquet'"] * n)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet([{files}])"
            )
