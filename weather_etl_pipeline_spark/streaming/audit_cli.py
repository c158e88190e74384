"""`weather-etl-audit` — print the curation service's audit report.

Operational wrapper around :func:`curation_loop.curation_audit_report`
over the same ``--root`` layout `weather-etl-curate` writes
(sig_store/ ivf_index/ lake/ rejects/):

    weather-etl-audit --root /data/curation [--family minhash] \\
        [--top-attractors 5]

Prints one JSON document: per-batch quarantine counts and replay
flags, store watermarks, IVF cell-population stats (skew +
rebuild hint — round 14), per-stage rejection reasons with top
attractor docs, and the anomaly list. Exit code 1 when anomalies are
present (cron-able: a non-empty anomaly list is the page), 0 otherwise.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="weather-etl-audit", description=__doc__.split("\n\n")[0]
    )
    ap.add_argument("--root", required=True, help="curation state root")
    ap.add_argument("--family", default="minhash", choices=["minhash", "simhash"])
    ap.add_argument("--top-attractors", type=int, default=5)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ..session import get_spark

    # same session-ownership discipline as curation_cli: only a session
    # this invocation created is ours to stop on exit
    owns_session = (
        SparkSession.getActiveSession() is None
        and getattr(SparkSession, "_instantiatedSession", None) is None
    )
    spark = get_spark("weather-etl-audit")
    try:
        root = args.root.rstrip("/")
        from .curation_loop import curation_audit_report

        report = curation_audit_report(
            spark,
            f"{root}/rejects",
            f"{root}/lake",
            f"{root}/sig_store",
            f"{root}/ivf_index",
            family=args.family,
            top_attractors=args.top_attractors,
        )
        print(json.dumps(report, indent=2, sort_keys=True))
        return 1 if report["anomalies"] else 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
