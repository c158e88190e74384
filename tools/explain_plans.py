"""Regenerate EXPLAINS.md: formatted physical plans + plan-shape facts
for the headline queries, plus a small scaling sweep. Evidence that the
engine produces the plans you'd want at 100 TB."""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_etl_pipeline_spark.registry import load_all  # noqa: E402
from weather_etl_pipeline_spark.session import get_spark  # noqa: E402

ANNOTATED = {
    "q1_pricing_summary": "two-level exact agg: map-side LONG partials collapse each partition before the first Exchange (which carries only #partitions x #groups rows); the second HashAggregate pair combines those partials with DECIMAL(38,0) sums over a few hundred rows — filter + column pruning pushed into the parquet scan",
    "star_join_revenue": "all four dimension joins broadcast — nation/region by explicit hint (constant-size at any SF), customer by AQE's measured-size decision (fact-scaled: a forced hint would OOM a 100x run) — the fact table never shuffles for them",
    "window_topk_orders_per_customer": "WindowGroupLimit pushes the rank<=3 limit below the sort — per-partition top-k, not full materialization",
    "global_topk_orders": "TakeOrderedAndProject — per-partition heap + merge, no global sort",
    "stream_session_windows": "one Exchange + one Sort for sessionization — minimal for a stateful window",
    "dedup_minhash_lsh": "narrow HOF shingle pipeline -> ONE collect_set groupBy (the only shuffle of shingle volume); signatures are a zip_with/least fold projection over the cached per-doc sets, which also feed both exact-verify sides",
    "simsearch_knn_bruteforce": "query side broadcast; corpus streamed once",
    "asof_join_last_error": "union + single window sort — the as-of join costs one shuffle, no UDF",
    "timeseries_gapfill_hourly": "rollup and forward-fill window both shuffle on user_id — AQE reuses the partitioning",
    "range_join_purchases_after_signup": "bucketed equi-join bounds interval-match candidates to 2 cells per row",
    "q5_local_supplier_volume": "the classic 6-way cycle: both fact joins shuffle on their keys, all dimensions broadcast, then the two-level exact agg collapses to 25 nation groups before the tiny final combine",
    "salted_event_totals": "aggregation-skew mitigation: stage 1 spreads each hot key over 32 salted sub-keys (map-side combinable), stage 2 merges #groups x #salts partial rows — the final Exchange carries hundreds of rows regardless of input skew",
    "split_train_val_test": "deterministic hash split is a pure narrow projection — no shuffle until the count rollup; at scale the split column is computed inline during any downstream write",
    "sessionize_events_rows": "one Exchange on user_id feeds all three windows; the in-session row_number needs only a partition-local re-sort on (user_id, sess_seq), never a second shuffle",
    "window_share_of_region_revenue": "the window runs over the 25-row rollup output, not the fact table — all heavy lifting stays in the map-side-combinable agg below it",
    "timeseries_interpolate_linear": "grid generation is executor-side (sequence+explode); both carry windows share the user_id partitioning — the forward carry runs as last() over the DESCENDING order, a streaming O(n) frame, not the O(n^2) UnboundedFollowing processor",
    "dedup_levenshtein_blocked": "self-join keyed on (lang, len_bucket) with 128-doc membership cap (row_number by doc_id, mirrored in the oracle) — pair-gen bounded at cells x cap^2 at any corpus scale; levenshtein on a fixed prefix bounds per-pair cost",
    "llm_corpus_curation": "quality score + keep-gate + split fuse into one codegen map stage over the scan; the whole curation chain costs one dedup exchange plus a tiny rollup",
    "dedup_jaccard_pairs": "capped posting ARRAYS collected in the cap window's own exchange, pairs by double-explode (no self-join shuffle) — candidate count bounded by vocab x cap^2, never df^2; exact verify joins explode from the cached per-doc token arrays",
    "pack_training_sequences": "per-(lang,source) shard windows — packing parallelizes across shards instead of serializing into one global total order",
    "text_bigram_top": "posexplode + per-doc lead, then hash agg with map-side partials; the argmax window runs over (lang,t1) groups — high cardinality, no hot key",
    "emb_quantize_int8": "pure map-stage HOF projection — quantization runs at scan speed with no shuffle",
}


EPILOGUE = """\
## Synthetic 10x sweep (fact tables amplified, fixed 32 cores)

`tools/scale_sweep.py` — zero-copy `@x10` path replication of the fact
tables (6M-row lineitem, 1M events, 5k docs); dimensions stay 1x so
join multiplicities model real growth. Interleaved best-of-2:

| query | sf0.1 | sf0.1@x10 | ratio |
|---|---|---|---|
| q1_pricing_summary | 0.90s | 1.05s | 1.2x |
| star_join_revenue | 1.41s | 1.23s | 0.9x |
| q3_shipping_priority | 0.86s | 0.97s | 1.1x |
| llm_corpus_curation | 0.76s | 0.91s | 1.2x |
| sessionize_events_rows | 0.95s | 0.94s | 1.0x |
| window_trailing_hour_range | 1.23s | 2.00s | 1.6x |

10x the data for 1.0-1.6x the time on fixed cores: the plans are
scheduling-floor-dominated locally and scale by adding executors, not
by rewriting — the property that matters at 100 TB.

## Jaccard posting-list cap (round 4)

`dedup_jaccard_pairs` now bounds candidate generation to the first 64
docs (by doc_id) of each `(lang, source, token)` posting list, with
exact-Jaccard verification over the full token sets of the surviving
candidates — the same candidates→verify split as the MinHash-LSH path.
Uncapped, candidates are Σ_token df(token)², quadratic in common-token
frequency; capped they are ≤ vocab × 64². The DuckDB oracle applies the
identical deterministic cap, so the hash-match holds by construction
(at the test corpora max df = 15 < 64, so results are bit-identical to
the uncapped form).

@x10 amplified sweep (fixed 32 cores, warm, noop sink):

| variant | sf0.1 | sf0.1@x10 | ratio |
|---|---|---|---|
| capped (64) | 2.77s | 15.13s | 5.5x |
| uncapped | 2.77s* | 26.03s | 9.4x |

(*identical plan at sf0.1: no posting list exceeds the cap there; the
@x10 corpus replicates every doc 10×, so every posting list is 10× and
every doc gains 9 exact duplicates — true pair output itself grows
~50×, which bounds how sub-linear any correct implementation can be.)
The capped variant's growth is candidate-bounded, not df²-bounded; the
gap widens quadratically with further amplification.

## window_trailing_hour_range @x10 re-measure (round 4)

Best-of-3, warm, noop sink, fixed 32 cores: sf0.1 0.67s → sf0.1@x10
0.66s (1.0x). The r2-era 1.6x ratio was host noise, not plan growth —
the RANGE frame is linear in events and needs no pre-bucketing.

## Round-4 performance audit (sf0.1, warm best-of-2, noop sink)

Systematic sweep of all 129 registered queries surfaced four
pathologies; each fix is a plan-shape change, not a tuning knob:

| query | before | after | root cause → fix |
|---|---|---|---|
| dedup_clusters_recursive_sql | 80.1s | 2.0s | Spark inlines the `edges` CTE into every recursion level and the per-level plan rewrite defeats `.cache()` (measured ~15s/level over 90 cached rows) → `localCheckpoint` the edge list; recursion reads a materialized RDD |
| timeseries_interpolate_linear | 11.4s | 1.8s | `currentRow → unboundedFollowing` frame re-aggregates the partition remainder per row (O(n²)) → running `last()` over DESCENDING order, same semantics, O(n) |
| dedup_levenshtein_blocked | 8.1s | 0.95s | 600 KB single-row-group scan = 1 partition; block-size² pair-gen ran single-threaded on 32 cores → `spread_to_cores` before the amplifying join |
| dedup_simhash(+portable) | 5.3s | 2.2s | same split-bound single-thread hashing → `spread_to_cores` |
| dedup_minhash_portable | 6.7s | 3.3s | shingle pipeline re-executed 4× (signatures + 2 verify sides + sizes) and k=32 row explosion through the shuffle → cache + flat per-k aggregate mins |

Counter-example worth recording: `simsearch_ivf_kmeans` got SLOWER with
spread_to_cores (4.7→7.8s) — its per-row math (k×dim=512 flops) is
trivial, so the added per-iteration shuffle only bought scheduling
overhead. Reverted to cache-only (4.2s). The rule that generalizes:
repartition to cores when per-row compute amplifies (pair-gen, heavy
hashing), never for iteration-bound loops where the fix is caching the
loop invariant.

Headline bench after the round: **13.2s** total (r01 19.8s, r02 15.9s),
with `star_join_revenue` at 1.14s under AQE-chosen broadcasts (the
forced customer hint is gone — same local plan, no 100× OOM hazard).

## Post-fix @x10 sweep (round 4, warm best-of-2, fixed 32 cores)

| query | sf0.1 | sf0.1@x10 | ratio |
|---|---|---|---|
| q1_pricing_summary | 1.27s | 0.93s | 0.7x |
| star_join_revenue | 1.76s | 1.37s | 0.8x |
| timeseries_gapfill_hourly | 1.03s | 1.12s | 1.1x |
| timeseries_interpolate_linear | 1.35s | 1.45s | 1.1x |
| window_trailing_hour_range | 0.47s | 0.55s | 1.2x |
| asof_join_last_error | 0.51s | 0.67s | 1.3x |
| dedup_jaccard_pairs | 3.02s | 2.00s | 0.7x |
| dedup_minhash_lsh | 1.69s | 5.51s | 3.3x |
| dedup_clusters_recursive_sql | 1.83s | 31.4s | 17x |
| dedup_levenshtein_blocked | 0.89s | 27.7s | 31x |

Reading the two groups honestly: row-bound plans (aggregation, joins,
windows, grid gap-fill, capped jaccard candidates) hold at 0.7-1.3x —
scheduling-floor-dominated, scale by adding executors. PAIR-OUTPUT-bound
dedup is different: `@x10` replicates every document 10x, which inflates
the TRUE near-duplicate pair density ~100x (every doc gains 9 exact
clones; every block's membership grows 10x with identical content), and
any correct pair-emitting implementation must pay for the pairs that
actually exist. At a real 100 TB corpus, new data adds mostly NEW
content — block sizes and per-band collision rates grow far slower than
under synthetic cloning, and the banded/blocked/capped structures keep
candidates ~linear. The levenshtein/minhash @x10 ratios measure the
adversarial-duplication worst case, not the production growth curve; the
capped jaccard row (0.7x) shows the posting-list cap doing exactly its
job under that same adversarial input.

## Round-5 scale fixes: the last quadratic pair-gens are gone

Round 4 left two adversarial-@x10 outliers; both were UNBOUNDED BLOCK
MEMBERSHIP (fixed blocking-key cardinality → membership grows linearly
with corpus → pairs quadratically), and both now carry the same
membership cap as the jaccard posting lists — first 128 docs per
`(lang, len_bucket)` cell by deterministic row_number, mirrored
verbatim in the DuckDB oracle:

| query | @x10 ratio r4 | @x10 ratio r5 | fix |
|---|---|---|---|
| dedup_levenshtein_blocked | 31x | 1.1x | 128-doc membership cap per cell |
| dedup_clusters_recursive_sql | 17x | 1.0x | same cap in the edge CTE + REPARTITION hint re-spreading the cap window's low-cardinality partitioning before the quadratic self-join (hint is a plain comment to DuckDB) |
| dedup_jaccard_pairs | 5.5x | 1.1x | pair-gen by double-explode of bounded posting ARRAYS collected in the cap window's own exchange — the self-join shuffle of the exploded index is gone |

Round-5 rework (warm best-of-N at sf0.1, noop sink):

| query | r4 | r5 | change |
|---|---|---|---|
| dedup_minhash_lsh | 2.17s | ~1.0s | fully narrow signature path: per-doc shingle ARRAYS as a projection (zero shuffles), signatures as zip_with/least folds |
| dedup_minhash_portable | 3.26s | ~1.5s | same narrow shape with arithmetic shingle codes; array_intersect verify |
| dedup_jaccard_pairs | 2.58s | ~2.2s | bounded-posting-array pair-gen (above) |
| dedup_clusters_recursive_sql | 6.2s* | ~2.7s | *post-cap regression fixed by the REPARTITION hint |
| text_langid_trigram | 2.44s | ~0.7s | literal profiles as HOF size(filter(...)) folds — no explode/join/shuffle |
| approx_distinct_users | 2.2s | ~0.7s | pre-dedup (type, user) pairs — no Expand-based distinct agg |
| decontaminate_test_overlap | 2.62s | ~1.4s | split bucket computed inline above the explode (no doc_id join) |
| text_repetition_filter | ~1.1s | ~0.8s | distinct-bigram count as size(shingle_arrays) — no explode round trip |

@x10 check of the reworked non-dedup plans (interleaved best-of-2,
fixed 32 cores): `text_langid_trigram` 3.5x, `text_repetition_filter`
2.6x, `decontaminate_test_overlap` 2.4x, `approx_distinct_users` 1.1x,
`dedup_clusters` 1.1x — 10x the row volume for 1-3.5x the time; every
plan is linear-work and scales by adding executors.

Three generalizable Catalyst findings from this work:

1. A HOF `transform()` over an array column materialized BEHIND AN
   EXCHANGE is O(1) per element access; without the exchange,
   CollapseProject inlines `split(text)` into the lambda and every
   element access re-evaluates it. The exchange is load-bearing, not
   just parallelism. Corollary: a FILTER over the transformed column
   gets pushed below the exchange and re-derives the array on the scan
   side — gate on size(_toks) BEFORE the transform instead (8×).
2. `collect_set` forces ObjectHashAggregate, which drops EVERY
   aggregate in the same groupBy out of whole-stage codegen — keep
   cheap codegen aggregates in a separate groupBy, or better, fold
   them as a projection over the collected array.
3. Project an array, explode it in a LATER select, and the optimizer
   inlines the array expression into the Generate node, re-evaluating
   it per OUTPUT row (14×: 0.33s → 4.68s at sf0.1 n=5). The explode
   must live in the same select that builds the array.
"""


def main() -> None:
    spark = get_spark("explain")
    reg = load_all()
    sf = "/root/testdata/sf0.1"
    out = [
        "# EXPLAINS — physical-plan evidence (regenerate: `python tools/explain_plans.py`)",
        "",
        "Formatted plans for the headline queries at sf0.1, with the",
        "scale-relevant shape called out. AQE is on; plans shown are the",
        "initial physical plans (AQE re-optimizes at runtime).",
        "",
    ]
    for name, note in ANNOTATED.items():
        q = reg[name]
        df = q.fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the operator tree, drop the verbose node details
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"**Why this plan scales:** {note}", "", "```", tree, "```", ""]

    out += [
        "## Scaling sweep (same plan, 100× data)",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 |",
        "|---|---|---|---|",
    ]
    sweep = ["q1_pricing_summary", "star_join_revenue", "text_term_frequency",
             "stream_session_windows", "window_topk_orders_per_customer"]
    for name in sweep:
        cells = []
        for sfd in ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                reg[name].fn(spark, sfd).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            cells.append(f"{best:.2f}s")
        out.append(f"| {name} | " + " | ".join(cells) + " |")
    out += [
        "",
        "Near-flat times across 100× scale-up: local runs are dominated by",
        "fixed job overhead, i.e. the plans have headroom — the work per",
        "row stays constant and the shuffles stay partial-aggregated.",
        "",
        EPILOGUE,
    ]

    Path(_REPO, "EXPLAINS.md").write_text("\n".join(out) + "\n")
    print("wrote EXPLAINS.md")
    spark.stop()


if __name__ == "__main__":
    main()
