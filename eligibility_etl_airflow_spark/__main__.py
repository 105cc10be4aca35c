"""CLI — the engine's standalone runner (parity with the reference's
``python run_predictions.py --input ... --output ...`` entry point,
SURVEY.md §3.3, but over Spark jobs).

    python -m eligibility_etl_airflow_spark list
    python -m eligibility_etl_airflow_spark query <name> [--sf-dir D] [--limit N]
    python -m eligibility_etl_airflow_spark pipeline <eligibility|predictions|resubmission>
        --out-dir OUT [--sf-dir D]
    python -m eligibility_etl_airflow_spark dag eligibility --work-dir DIR [--sf-dir D]
    python -m eligibility_etl_airflow_spark multi-bu <query> --source bu_a=/dir/a
        --source bu_b=/dir/b [--out-dir OUT]
    python -m eligibility_etl_airflow_spark layout <range|zorder> --in-parquet P --out O --by c1,c2
    python -m eligibility_etl_airflow_spark bench [--sf-dir D]
"""

from __future__ import annotations

import argparse
import json
import sys

from eligibility_etl_airflow_spark import pipelines, registry
from eligibility_etl_airflow_spark.session import get_spark

DEFAULT_SF = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="eligibility_etl_airflow_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    qp = sub.add_parser("query", help="run one registered query, print rows")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default=DEFAULT_SF)
    qp.add_argument("--limit", type=int, default=20)

    pp = sub.add_parser("pipeline", help="run an end-to-end pipeline")
    pp.add_argument(
        "name",
        choices=[
            "eligibility",
            "predictions",
            "resubmission",
            "events-stream",
            "corpus-curation",
            "training-prep",
            "crawl-preprocess",
            "crawl-frontier",
        ],
    )
    pp.add_argument("--out-dir", required=True)
    pp.add_argument("--sf-dir", default=DEFAULT_SF)
    pp.add_argument(
        "--raw-crawl",
        default=None,
        help="crawl-preprocess / crawl-frontier (required there): parquet "
        "path of raw crawl records (doc_id, url, html)",
    )
    pp.add_argument(
        "--robots-parquet",
        default=None,
        help="crawl-preprocess / crawl-frontier: parquet path of robots "
        "state (domain, robots) — enables the robots.txt admission stage",
    )
    pp.add_argument(
        "--quarantine-path",
        default=None,
        help="crawl-preprocess only: write one (doc_id, url, reason) row "
        "per dropped record (drop provenance)",
    )
    pp.add_argument(
        "--per-domain-budget",
        type=int,
        default=10,
        help="crawl-frontier only: max fetches per domain per cycle",
    )
    pp.add_argument(
        "--max-per-domain",
        type=int,
        default=None,
        help="crawl-frontier only: cap each domain's scheduled queue",
    )
    pp.add_argument(
        "--frontier-state-dir",
        default=None,
        help="crawl-frontier only: run the CONTINUOUS form "
        "(run_incremental_frontier) — domain edges accumulate in this "
        "state directory and PageRank warm-starts from the previous "
        "cycle's persisted ranks; share it with crawl-ingest to "
        "anti-join the full crawl history",
    )
    pp.add_argument(
        "--compact-threshold",
        type=int,
        default=32,
        help="crawl-frontier with --frontier-state-dir only: rewrite the "
        "edge state once its parquet file count exceeds max(this, 2x "
        "its compacted size); 0 disables — same knob as the "
        "incremental-curation / crawl-ingest subcommands",
    )
    pp.add_argument(
        "--docs-parquet",
        default=None,
        help="corpus-curation / training-prep only: read the documents "
        "relation from this parquet path instead of "
        "<sf-dir>/documents.parquet (chains stages: point it at a "
        "previous stage's curated_docs)",
    )
    pp.add_argument(
        "--span-dedup",
        action="store_true",
        help="training-prep only: exact-substring span removal before "
        "chunking — duplicated 16-token-window spans keep only their "
        "corpus-first copy, cut at exact offsets (Lee et al. 2022)",
    )
    pp.add_argument(
        "--span-exact",
        action="store_true",
        help="training-prep only: key span removal on window TEXT "
        "instead of xxhash64 — required past ~1e9 windows, where a "
        "64-bit collision would cut never-duplicated text",
    )
    pp.add_argument(
        "--min-latin-fraction",
        type=float,
        default=None,
        help="crawl-preprocess only: drop docs below this Latin character "
        "fraction (mixed-script gate)",
    )
    pp.add_argument(
        "--max-mojibake-per-kchar",
        type=float,
        default=None,
        help="crawl-preprocess only: drop docs whose cp1252 double-"
        "encoding signature density exceeds this many hits per 1000 "
        "chars (valid-UTF-8 wrong-text the byte triage cannot see)",
    )
    pp.add_argument(
        "--neardup-removal",
        choices=["component", "pair"],
        default="component",
        help="corpus-curation only: keep one doc per transitive near-dup "
        "group (component) or drop each pair's higher id (pair)",
    )
    pp.add_argument(
        "--neardup-keeper",
        choices=["min_id", "quality"],
        default="min_id",
        help="corpus-curation only: which doc each near-dup component "
        "keeps — the min id, or the argmax-quality member (component "
        "removal only)",
    )
    pp.add_argument(
        "--blocklist",
        default=None,
        help="corpus-curation only: comma-separated blocklist terms (the "
        "C4 bad-words stage); docs whose hit fraction exceeds "
        "--blocklist-max-fraction drop",
    )
    pp.add_argument(
        "--blocklist-max-fraction",
        type=float,
        default=0.0,
        help="corpus-curation only: tolerated blocklist-token fraction "
        "(0.0 = any hit drops)",
    )
    pp.add_argument(
        "--repetition-filter",
        action="store_true",
        help="corpus-curation only: drop docs failing the Gopher-family "
        "repetition thresholds",
    )
    pp.add_argument(
        "--decontam-bench",
        default=None,
        help="corpus-curation only: parquet path of an eval set (text "
        "column); docs sharing any 8-gram with it are dropped",
    )
    pp.add_argument(
        "--fluency-cut",
        type=float,
        default=None,
        help="corpus-curation only: drop this fraction (0-1) of surviving "
        "docs with the highest unigram-LM mean NLL (CCNet perplexity cut)",
    )
    pp.add_argument(
        "--semantic-decontam-bench",
        default=None,
        help="corpus-curation only: parquet path of benchmark embeddings "
        "(bench_id, embedding); docs whose embedding is "
        "--semantic-decontam-threshold cosine-close to any bench item drop",
    )
    pp.add_argument(
        "--semantic-decontam-threshold",
        type=float,
        default=0.95,
        help="corpus-curation only: cosine cut for --semantic-decontam-bench",
    )
    pp.add_argument(
        "--semantic-eps",
        type=float,
        default=None,
        help="corpus-curation only: SemDeDup stage — drop docs whose "
        "embedding is this cosine-close to an earlier-kept cluster member",
    )
    pp.add_argument(
        "--semantic-k",
        type=int,
        default=16,
        help="corpus-curation only: k-means cluster count for --semantic-eps",
    )
    pp.add_argument(
        "--audit-path",
        default=None,
        help="corpus-curation only: write the funnel audit trail "
        "(doc_id, dropped_at stage) to this parquet path",
    )

    ip = sub.add_parser(
        "incremental-curation",
        help="curate a new document batch against the persisted corpus "
        "index (exact + fuzzy dedup vs state, idempotent appends)",
    )
    ip.add_argument("--batch-parquet", required=True, help="parquet path of the new batch (doc_id, text)")
    ip.add_argument("--state-dir", required=True, help="corpus state directory (indexes + accepted docs)")
    ip.add_argument("--jaccard-threshold", type=float, default=0.8)
    ip.add_argument(
        "--semantic-eps",
        type=float,
        default=None,
        help="also check the batch's embedding column against the "
        "persisted vector index (SemDeDup incremental form)",
    )
    ip.add_argument("--semantic-k", type=int, default=16)
    ip.add_argument(
        "--drift-report",
        action="store_true",
        help="surface the batch-vs-corpus unigram JSD (computed against "
        "the persisted token index — O(batch + vocab), accepted text "
        "never re-read)",
    )
    ip.add_argument(
        "--compact-threshold", type=int, default=32,
        help="rewrite a state index once its parquet file count exceeds "
        "max(this, 2x its compacted size) — between batches, after the "
        "token folds; 0 disables",
    )

    cip = sub.add_parser(
        "crawl-ingest",
        help="ingest a new raw-crawl batch (doc_id, url, html) against "
        "the persisted crawl state: URL + content dedup vs indexes, "
        "preprocessing, idempotent appends",
    )
    cip.add_argument("--batch-parquet", required=True,
                     help="parquet path of the raw batch (doc_id, url, html)")
    cip.add_argument("--state-dir", required=True,
                     help="crawl state directory (accepted docs + indexes)")
    cip.add_argument(
        "--recrawl-policy", choices=["skip", "update"], default="skip",
        help="skip: drop already-seen canonical URLs; update: replace "
        "accepted docs whose re-crawled content changed",
    )
    cip.add_argument(
        "--drift-report",
        action="store_true",
        help="surface the batch-vs-corpus unigram JSD via the persisted "
        "token index",
    )
    cip.add_argument(
        "--compact-threshold", type=int, default=32,
        help="rewrite a state index once its parquet file count exceeds "
        "max(this, 2x its compacted size) — between batches, after the "
        "token folds; 0 disables",
    )

    dp = sub.add_parser(
        "dag", help="run a task-graph orchestration (the Airflow-DAG analog)"
    )
    dp.add_argument("name", choices=["eligibility"])
    dp.add_argument("--work-dir", required=True)
    dp.add_argument("--sf-dir", default=DEFAULT_SF)

    mp = sub.add_parser(
        "multi-bu",
        help="run one query across N business-unit sources, union with a BU column "
        "(the clinics-DAG fan-out, dags/clinics_resubmission_etl.py:116-123)",
    )
    mp.add_argument("name", help="registered query to fan out")
    mp.add_argument(
        "--source",
        action="append",
        required=True,
        metavar="BU=DIR",
        help="repeatable business-unit source mapping, e.g. --source clinic_a=/data/a",
    )
    mp.add_argument("--out-dir", default=None)
    mp.add_argument("--limit", type=int, default=20)

    aq = sub.add_parser(
        "ann-query",
        help="ANN top-k over a curation state's persisted vector index "
        "(index_centroids + index_vectors, the semantic-dedup byproduct)",
    )
    aq.add_argument("--state-dir", required=True)
    aq.add_argument(
        "--queries-parquet", required=True,
        help="parquet with (vec_id, embedding) query rows",
    )
    aq.add_argument("--out-dir", default=None, help="write results instead of show")
    aq.add_argument("--k", type=int, default=5)
    aq.add_argument("--nprobe", type=int, default=4)
    aq.add_argument("--limit", type=int, default=20)

    lp = sub.add_parser(
        "layout",
        help="rewrite a parquet dataset clustered for scan pruning: "
        "range (one leading key) or zorder (multi-column Morton curve)",
    )
    lp.add_argument("strategy", choices=["range", "zorder"])
    lp.add_argument("--in-parquet", required=True)
    lp.add_argument("--out", required=True)
    lp.add_argument("--by", required=True, help="comma-separated cluster columns")
    lp.add_argument("--num-files", type=int, default=None)
    lp.add_argument("--bits", type=int, default=6, help="zorder bucket bits")

    args = ap.parse_args(argv)
    registry.load_all()

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            tag = "oracle" if name in registry.ORACLES else "rows"
            print(f"{name}  [{tag}]")
        return 0

    spark = get_spark("engine-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        if args.name not in registry.QUERIES:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = registry.QUERIES[args.name](spark, args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "pipeline":
        # shared between the corpus-curation and crawl-preprocess
        # branches so a parsing tweak cannot land in one and not the other
        def blocklist_kwargs() -> dict:
            if not args.blocklist:
                return {}
            return {
                "blocklist_terms": tuple(
                    t.strip() for t in args.blocklist.split(",") if t.strip()
                ),
                "blocklist_max_fraction": args.blocklist_max_fraction,
            }

        if args.name in ("crawl-preprocess", "crawl-frontier"):
            # dispatched before the sf_dir-shaped map below: these are the
            # pipelines whose first argument is a DataFrame, not a dir
            if not args.raw_crawl:
                print(f"{args.name} requires --raw-crawl", file=sys.stderr)
                return 2
            pages = spark.read.parquet(args.raw_crawl)
            robots_kwargs = {}
            if args.robots_parquet:
                robots_kwargs["robots_df"] = spark.read.parquet(args.robots_parquet)
            if args.name == "crawl-frontier":
                if args.frontier_state_dir:
                    stats = pipelines.run_incremental_frontier(
                        spark,
                        pages,
                        args.frontier_state_dir,
                        args.out_dir,
                        per_domain_budget=args.per_domain_budget,
                        max_per_domain=args.max_per_domain,
                        compact_threshold=args.compact_threshold or None,
                        **robots_kwargs,
                    )
                else:
                    stats = pipelines.run_crawl_frontier_pipeline(
                        spark,
                        pages,
                        args.out_dir,
                        per_domain_budget=args.per_domain_budget,
                        max_per_domain=args.max_per_domain,
                        **robots_kwargs,
                    )
                print(json.dumps(stats, default=str))
                return 0
            kwargs = blocklist_kwargs()
            kwargs.update(robots_kwargs)
            if args.min_latin_fraction is not None:
                kwargs["min_latin_fraction"] = args.min_latin_fraction
            if args.max_mojibake_per_kchar is not None:
                kwargs["max_mojibake_per_kchar"] = args.max_mojibake_per_kchar
            if args.quarantine_path:
                kwargs["quarantine_path"] = args.quarantine_path
            raw = pages
            print(
                json.dumps(
                    pipelines.run_crawl_preprocess_pipeline(
                        spark, raw, args.out_dir, **kwargs
                    ),
                    default=str,
                )
            )
            return 0
        fn = {
            "eligibility": pipelines.run_eligibility_pipeline,
            "predictions": pipelines.run_predictions_pipeline,
            "resubmission": pipelines.run_resubmission_pipeline,
            "events-stream": pipelines.run_events_stream_pipeline,
            "corpus-curation": pipelines.run_corpus_curation_pipeline,
            "training-prep": pipelines.run_training_prep_pipeline,
        }[args.name]
        kwargs = {}
        if args.name == "corpus-curation":
            kwargs["neardup_removal"] = args.neardup_removal
            kwargs["neardup_keeper"] = args.neardup_keeper
            kwargs["repetition_filter"] = args.repetition_filter
            kwargs.update(blocklist_kwargs())
            if args.decontam_bench:
                kwargs["decontam_bench"] = spark.read.parquet(args.decontam_bench)
            if args.semantic_decontam_bench:
                kwargs["semantic_decontam_bench"] = spark.read.parquet(
                    args.semantic_decontam_bench
                )
                kwargs["semantic_decontam_threshold"] = args.semantic_decontam_threshold
            if args.fluency_cut is not None:
                kwargs["fluency_cut"] = args.fluency_cut
            if args.semantic_eps is not None:
                kwargs["semantic_eps"] = args.semantic_eps
                kwargs["semantic_k"] = args.semantic_k
            if args.audit_path:
                kwargs["audit_path"] = args.audit_path
        if args.span_exact and not args.span_dedup:
            print(
                "--span-exact requires --span-dedup (exact mode is a "
                "property OF span removal; without the stage nothing "
                "would run and the flag would silently lie)",
                file=sys.stderr,
            )
            return 2
        if args.name == "training-prep" and args.span_dedup:
            kwargs["span_dedup"] = True
            if args.span_exact:
                kwargs["span_exact"] = True
        if args.docs_parquet and args.name in ("corpus-curation", "training-prep"):
            kwargs["documents"] = spark.read.parquet(args.docs_parquet)
        print(json.dumps(fn(spark, args.sf_dir, args.out_dir, **kwargs), default=str))
        return 0

    if args.cmd == "incremental-curation":
        batch = spark.read.parquet(args.batch_parquet)
        inc_kwargs = {"jaccard_threshold": args.jaccard_threshold}
        if args.semantic_eps is not None:
            inc_kwargs["semantic_eps"] = args.semantic_eps
            inc_kwargs["semantic_k"] = args.semantic_k
        if args.drift_report:
            inc_kwargs["drift_report"] = True
        inc_kwargs["compact_threshold"] = args.compact_threshold or None
        stats = pipelines.run_incremental_curation(
            spark, batch, args.state_dir, **inc_kwargs
        )
        print(json.dumps(stats, default=str))
        return 0

    if args.cmd == "crawl-ingest":
        batch = spark.read.parquet(args.batch_parquet)
        stats = pipelines.run_incremental_crawl_ingest(
            spark,
            batch,
            args.state_dir,
            recrawl_policy=args.recrawl_policy,
            drift_report=args.drift_report,
            compact_threshold=args.compact_threshold or None,
        )
        print(json.dumps(stats, default=str))
        return 0

    if args.cmd == "ann-query":
        queries = spark.read.parquet(args.queries_parquet)
        res = pipelines.ann_query_state(
            spark, args.state_dir, queries, k=args.k, nprobe=args.nprobe
        )
        if args.out_dir:
            from eligibility_etl_airflow_spark.sources import sinks as _sinks

            _sinks.write_parquet(res, args.out_dir)
        else:
            res.show(args.limit, truncate=False)
        return 0

    if args.cmd == "layout":
        from eligibility_etl_airflow_spark.operators import zorder
        from eligibility_etl_airflow_spark.sources import sinks

        df = spark.read.parquet(args.in_parquet)
        cols = [c.strip() for c in args.by.split(",") if c.strip()]
        if args.strategy == "zorder":
            zorder.write_zordered(
                df, args.out, cols, bits=args.bits, num_files=args.num_files
            )
        else:
            sinks.write_clustered(df, args.out, cols, num_files=args.num_files)
        print(json.dumps({"strategy": args.strategy, "by": cols, "out": args.out}))
        return 0

    if args.cmd == "multi-bu":
        if args.name not in registry.QUERIES:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        sources = dict(s.split("=", 1) for s in args.source)
        df = pipelines.run_multi_business_unit(
            spark, args.name, sources, out_dir=args.out_dir
        )
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "dag":
        from eligibility_etl_airflow_spark.dag import eligibility_dag

        d = eligibility_dag(spark, args.sf_dir, args.work_dir)
        print(json.dumps({"levels": d.levels(), "results": d.run()}, default=str))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
