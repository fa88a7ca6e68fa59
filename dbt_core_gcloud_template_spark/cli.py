"""Engine CLI (SURVEY.md §2.11): the dbt-verb surface.

    python -m dbt_core_gcloud_template_spark build --project-dir demo_project
    ... run | test | seed | snapshot | ls | compile | debug | docs |
        freshness | diff | schema-diff

State/defer (Slim CI parity, reference scripts/ci_build.sh:38-58):
    build --select state:modified+ --state <prior-target-dir> --defer
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .plans.docs import write_docs
from .plans.manifest import Manifest
from .plans.runner import Engine
from .session import get_spark


def _engine(args) -> Engine:
    spark = get_spark(
        "engine-cli", warehouse_dir=os.path.abspath(args.warehouse)
    )
    return Engine(
        spark,
        args.project_dir,
        target=args.target,
        state_dir=args.target_path,
    )


def _prior(args) -> Manifest | None:
    # --state accepts local dirs AND artifact URIs (memory://, file://,
    # gs:// via fsspec) — the ci_build.sh "download prod state" analog.
    from .plans import arturi

    if args.state:
        path = arturi.join(args.state, "manifest.json")
        if arturi.exists(path):
            return Manifest.read(path)
    return None


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="engine")
    p.add_argument("command", choices=[
        "build", "run", "test", "seed", "snapshot", "ls", "compile",
        "debug", "docs", "freshness", "diff", "schema-diff",
        "run-operation", "orphans", "create-schema", "drop-schema", "deps",
        "analyze", "retry", "show", "clone", "optimize", "vacuum", "init",
        "export", "lint", "monitor", "restate",
    ])
    p.add_argument("macro_name", nargs="?", default=None,
                   help="macro name for run-operation")
    p.add_argument("--args", default="{}", help="JSON args for run-operation")
    p.add_argument("--schema", default=None, help="schema for orphans/DDL commands")
    p.add_argument("--project-dir", default="demo_project")
    p.add_argument("--target", default=None)
    p.add_argument("--target-path", default=None, help="artifact/state output dir")
    p.add_argument("--warehouse", default="spark-warehouse")
    p.add_argument("--select", "-s", default=None)
    p.add_argument("--exclude", default=None, help="selector to subtract from --select")
    p.add_argument("--selector", default=None,
                   help="named selector from selectors.yml")
    p.add_argument("--fail-fast", action="store_true", dest="fail_fast",
                   help="stop scheduling new nodes after the first error/fail")
    p.add_argument("--state", default=None, help="dir with prior manifest.json")
    p.add_argument("--defer", dest="defer_", action="store_true")
    p.add_argument("--full-refresh", action="store_true")
    p.add_argument("--empty", action="store_true", help="schema-only dry run (LIMIT 0)")
    p.add_argument("--sample", default=None, metavar="WINDOW",
                   help="dbt sample mode: time-window refs/sources with "
                        "event_time to the trailing WINDOW (e.g. '3 days')")
    p.add_argument("--vars", default=None, help="JSON dict overriding project vars")
    p.add_argument("--inline", default=None, help="ad-hoc jinja SQL for show")
    # diff options (E14/E15)
    p.add_argument("--table", default=None)
    p.add_argument("--left-schema", default=None)
    p.add_argument("--right-schema", default=None)
    p.add_argument("--limit", type=int, default=None,
                   help="row cap (diff/show default 100; export default: all)")
    p.add_argument("--zorder", default=None, help="comma-separated zorder columns for optimize")
    p.add_argument("--compact-deltas-through", type=int, default=None,
                   dest="compact_deltas_through",
                   help="optimize: row-compact a drift count-delta log "
                        "through this ingest_lo horizon (see "
                        "operators/drift.py:compact_count_deltas)")
    p.add_argument("--day", type=int, default=None,
                   help="restate: the ingest_lo day tag to evict from a "
                        "drift count-delta log so a corrected re-delivery "
                        "can re-ingest.  Eviction removes the day's rows "
                        "across ALL spec generations (a later rebaseline "
                        "to an earlier fingerprint will not see pre-"
                        "restate history for this day)")
    p.add_argument("--format", default=None,
                   choices=["jsonl", "csv", "parquet", "markdown"],
                   help="export output format; `markdown` renders "
                        "diff/schema-diff as the PR-comment table")
    p.add_argument("--path", default=None, help="export output directory")
    p.add_argument("--threads", type=int, default=None,
                   help="override the profile's DAG thread count")
    p.add_argument("--owner", default=None,
                   help="create-schema: owning principal recorded as a "
                        "DBPROPERTY (the dataset-ACL-hardening analog)")
    p.add_argument("--serve", action="store_true",
                   help="docs: serve the generated docs over HTTP (S17)")
    p.add_argument("--port", type=int, default=8080, help="docs --serve port")
    p.add_argument("--max-input-bytes", type=int, default=None,
                   dest="max_input_bytes",
                   help="monitor: alert when a node's input estimate "
                        "exceeds this many bytes")
    p.add_argument("--min-recall", type=float, default=None,
                   dest="min_recall",
                   help="monitor: alert when a node-reported *recall* "
                        "metric (diagnostics stages write these into "
                        "run_results next to the fence telemetry) falls "
                        "below this threshold")
    p.add_argument("--min-auc", type=float, default=None,
                   dest="min_auc",
                   help="monitor: alert when a node-reported *auc* "
                        "metric (the quality-tier diagnostics stage) "
                        "falls below this threshold")
    p.add_argument("--max-psi", type=float, default=None,
                   dest="max_psi",
                   help="monitor: alert when a node-reported *psi* "
                        "metric (the dataset-drift diagnostics stage) "
                        "rises above this threshold (0.25 is the "
                        "conventional action line)")
    args = p.parse_args(argv)

    if args.command == "init":
        # The reference repo IS a project template; `init` scaffolds the
        # same layout (project.yml/profiles.yml/models/seeds/snapshots)
        # pre-wired for a first `engine build`.
        root = args.project_dir
        if os.path.exists(os.path.join(root, "project.yml")):
            print(f"init: {root}/project.yml already exists", file=sys.stderr)
            return 2
        for d in ("models/staging", "models/marts", "seeds", "snapshots", "macros"):
            os.makedirs(os.path.join(root, d), exist_ok=True)
        name = os.path.basename(os.path.abspath(root)).replace("-", "_") or "my_project"
        _w = lambda rel, text: open(os.path.join(root, rel), "w").write(text)  # noqa: E731
        _w("project.yml", (
            f"name: {name}\nprofile: {name}\n"
            "models:\n  staging:\n    +materialized: view\n"
            "  marts:\n    +materialized: table\n"
        ))
        _w("profiles.yml", (
            f"{name}:\n  target: dev\n  outputs:\n"
            "    dev:\n      schema: analytics_dev\n      threads: 4\n"
            "    prod:\n      schema: analytics\n      threads: 8\n"
        ))
        _w("models/staging/src_raw.yml", (
            "sources:\n  - name: raw\n    schema: raw\n    tables:\n"
            "      - name: example\n        external:\n"
            "          location: \"{{ env_var('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.001') }}/orders.parquet\"\n"
            "          format: parquet\n"
        ))
        _w("models/staging/stg_example.sql", (
            "select o_orderkey as id,\n"
            "       cast(cast(o_orderdate as string) as timestamp) as created_at_ts,\n"
            "       cast(o_totalprice as decimal(38,9)) as value\n"
            "from {{ source('raw', 'example') }}\n"
        ))
        _w("models/staging/stg_example.yml", (
            "models:\n  - name: stg_example\n    columns:\n"
            "      - name: id\n        tests: [unique, not_null]\n"
        ))
        _w("models/marts/fct_example.sql", (
            "select id, value, created_at_ts,\n"
            "       case when value > 100 then 'high' else 'regular' end as bucket\n"
            "from {{ ref('stg_example') }}\n"
        ))
        _w("seeds/example_seed.csv", "id,name\n1,Alice\n2,Bob\n")
        print(f"initialized project `{name}` in {root}")
        return 0

    if args.command == "lint":
        # CI gate parity with the reference's sqlfluff+yamllint hooks
        # (ci.yml:14-36): exit 1 on any error-severity finding.  Runs
        # through lint_project so a project too broken to load is a
        # finding, not a stack trace.
        spark = get_spark(
            "engine-cli", warehouse_dir=os.path.abspath(args.warehouse)
        )
        findings = Engine.lint_project(
            spark, args.project_dir, target=args.target, select=args.select
        )
        for f in findings:
            print(json.dumps(f))
        errs = sum(1 for f in findings if f["severity"] == "error")
        print(
            f"lint: {len(findings)} finding(s), {errs} error(s)",
            file=sys.stderr,
        )
        return 1 if errs else 0

    eng = _engine(args)
    if args.threads:
        eng.threads = args.threads  # dbt --threads parity
    if args.vars:
        # dbt --vars: CLI-supplied values override project.yml vars for
        # this invocation (config resolution happens at compile time)
        eng.project.vars.update(json.loads(args.vars))
    if args.selector:
        if args.select:
            print("cannot combine --select and --selector", file=sys.stderr)
            return 2
        spec = eng.project.selectors.get(args.selector)
        if spec is None:
            print(f"selector {args.selector!r} not found in selectors.yml "
                  f"(have: {sorted(eng.project.selectors)})", file=sys.stderr)
            return 2
        args.select = spec["definition"]
    elif (
        args.select is None
        and eng.project.selectors
        and args.command in ("build", "run", "test", "seed", "snapshot", "ls", "compile")
    ):
        # dbt: a selector marked `default: true` applies when no
        # explicit selection is given (selection-driven commands only)
        args.select = eng.project.default_selector()
    prior = _prior(args)
    defer_manifest = prior if args.defer_ else None

    if args.command in ("build", "run", "test", "seed", "snapshot"):
        rtypes = {
            "build": None,
            "run": {"model"},
            "test": {"test", "model"},  # models needed for selection edges
            "seed": {"seed"},
            "snapshot": {"snapshot"},
        }[args.command]
        if args.command == "test":
            # tests only: select tests whose parents exist already
            rtypes = {"test", "unit_test"}
        results, manifest = eng.build(
            select=args.select,
            full_refresh=args.full_refresh,
            defer_manifest=defer_manifest,
            prior_manifest=prior,
            resource_types=rtypes,
            exclude=args.exclude,
            empty=args.empty,
            fail_fast=args.fail_fast,
            sample=args.sample,
        )
        counts = results.status_counts
        print(json.dumps({"status_counts": counts, "elapsed": results.elapsed}))
        bad = counts.get("error", 0) + counts.get("fail", 0)
        return 1 if bad else 0

    if args.command == "show":
        if args.inline:
            rows = eng.show_inline(args.inline, limit=args.limit if args.limit is not None else 100)
        else:
            rows = eng.show(args.select, limit=args.limit if args.limit is not None else 100)
        for r in rows:
            print(json.dumps(r, default=str))
        return 0

    if args.command == "clone":
        if prior is None:
            print("clone: --state dir with manifest.json required", file=sys.stderr)
            return 2
        out = eng.clone(prior, select=args.select)
        print(json.dumps(out, indent=2))
        return 0

    if args.command == "retry":
        # dbt retry parity: re-run error/fail/skipped nodes from the
        # previous run_results.json in the state dir
        results, _ = eng.retry()
        counts = results.status_counts
        print(json.dumps({"status_counts": counts, "elapsed": results.elapsed}))
        bad = counts.get("error", 0) + counts.get("fail", 0)
        return 1 if bad else 0

    if args.command == "ls":
        manifest = eng.compile()
        sel = manifest.select(args.select, prior=prior)
        if args.exclude:
            sel -= manifest.select(args.exclude, prior=prior)
        for uid in sorted(sel):
            print(uid)
        return 0

    if args.command == "compile":
        from .plans import arturi

        manifest = eng.compile()
        manifest.write(arturi.join(eng.state_dir, "manifest.json"))
        print(f"compiled {len(manifest.nodes)} nodes → {eng.state_dir}/manifest.json")
        return 0

    if args.command == "deps":
        # E10: the reference installs dbt packages (entrypoint.sh:70);
        # our macros/tests are plain Python — nothing to fetch.
        print("deps: nothing to install (macros are in-package)")
        return 0

    if args.command == "optimize":
        if not args.table:
            print("optimize: --table required", file=sys.stderr)
            return 2
        z = [c for c in (args.zorder or "").split(",") if c] or None
        try:
            out = eng.optimize(
                args.table, zorder=z,
                compact_deltas_through=args.compact_deltas_through,
            )
        except ValueError as e:
            # engine refusals (not a count-delta log, horizon conflicts)
            # are user errors, not tracebacks (r12 advice)
            print(f"optimize: {e}", file=sys.stderr)
            return 2
        print(json.dumps(out))
        return 0

    if args.command == "restate":
        # Drift-log restatement (r12): evict one ingested day so the
        # model's retry anti-join lets a CORRECTED re-delivery fold —
        # refuses days below the compaction horizon (full-refresh
        # territory).  See Engine.restate_drift_day.
        if not args.table or args.day is None:
            print("restate: --table and --day required", file=sys.stderr)
            return 2
        try:
            out = eng.restate_drift_day(args.table, args.day)
        except ValueError as e:
            # engine refusals (below-horizon day, no stored rows, not a
            # count-delta log) are clean user errors with a non-zero
            # exit, like the argument validation above (r12 advice)
            print(f"restate: {e}", file=sys.stderr)
            return 2
        print(json.dumps(out))
        return 0

    if args.command == "export":
        # Relation -> file handoff (training-data export, downstream
        # consumers): distributed write, one file per partition — at
        # scale repartition to the shard layout first (see
        # sampling.global_shuffle) instead of coalescing to one file.
        if not args.table or not args.path:
            print("export: --table and --path required", file=sys.stderr)
            return 2
        df = eng.spark.table(args.table)
        if args.limit is not None:
            df = df.limit(args.limit)
        # count from the source relation, not a schema-inferring re-read
        # of the output (which fails outright on empty JSONL/CSV exports
        # and scans the whole export a second time otherwise)
        n = df.count()
        w = df.write.mode("overwrite")
        if args.format is None:
            args.format = "jsonl"
        if args.format == "jsonl":
            w.json(args.path)
        elif args.format == "csv":
            w.option("header", True).csv(args.path)
        else:
            w.parquet(args.path)
        print(json.dumps({"table": args.table, "path": args.path,
                          "format": args.format, "rows": n}))
        return 0

    if args.command == "vacuum":
        print(json.dumps(eng.vacuum(schema=args.schema)))
        return 0

    if args.command == "analyze":
        # CBO stats refresh (the warehouse-metadata analog; see
        # Engine.analyze docstring for the 100 TB rationale)
        res = eng.analyze(select=args.select)
        print(json.dumps(res, indent=2))
        return 0

    if args.command == "debug":
        print(json.dumps(eng.debug(), indent=2))
        return 0

    if args.command == "docs":
        # http.server can only serve a LOCAL directory; fail fast when
        # --serve is combined with a URI state dir (memory:// / gs://)
        # rather than after generating artifacts it cannot serve.
        if args.serve and "://" in eng.state_dir and not eng.state_dir.startswith("file://"):
            print(
                f"docs --serve: cannot serve non-local state dir "
                f"{eng.state_dir!r}; use --target-path with a local path",
                file=sys.stderr,
            )
            return 2
        manifest = eng.compile()
        out = os.path.join(eng.state_dir, "index.html")
        write_docs(manifest, out)
        # dbt catalog.json parity: warehouse-observed schema per built
        # relation (what `dbt docs generate` collects from the adapter)
        catalog: dict = {"nodes": {}}
        for uid, n in manifest.nodes.items():
            if n.resource_type not in ("model", "seed", "snapshot"):
                continue
            try:
                cols = {
                    f.name: {"type": f.dataType.simpleString(), "index": i}
                    for i, f in enumerate(eng.spark.table(n.fqn).schema.fields)
                }
            except Exception:
                continue  # not built yet
            catalog["nodes"][uid] = {"metadata": {"name": n.alias, "schema": n.schema}, "columns": cols}
        cat_path = os.path.join(eng.state_dir, "catalog.json")
        with open(cat_path, "w") as f:
            json.dump(catalog, f, indent=2)
        print(f"docs → {out}; catalog → {cat_path}")
        if args.serve:
            # S17: the docs-viewer analog (docs-viewer/app.py) — serve
            # the artifact dir over HTTP until interrupted.
            from .plans.docs import serve_docs

            server = serve_docs(
                eng.state_dir.removeprefix("file://"), port=args.port
            )
            host, port = server.server_address[:2]
            print(f"serving docs at http://{host}:{port}/ (ctrl-c to stop)")
            try:
                import time as _time

                while True:
                    _time.sleep(3600)
            except KeyboardInterrupt:
                server.shutdown()
        return 0

    if args.command == "monitor":
        # A8: log-metric alerting analog — evaluate "count > 0" alert
        # policies over the run artifacts, write alerts.json, exit 1
        # when any ERROR-severity alert fires (warn-only alerts — e.g.
        # freshness warn, bytes-cap advisories — print but exit 0; the
        # CI/scheduler hook point keys off the exit code).
        from .plans.monitor import evaluate_alerts

        alerts = evaluate_alerts(
            eng.state_dir,
            max_input_bytes=args.max_input_bytes,
            min_recall=args.min_recall,
            min_auc=args.min_auc,
            max_psi=args.max_psi,
        )
        for a in alerts:
            print(json.dumps(a))
        print(f"monitor: {len(alerts)} alert(s)", file=sys.stderr)
        return 1 if any(a["severity"] == "error" for a in alerts) else 0

    if args.command == "freshness":
        res = eng.source_freshness(select=args.select)
        print(json.dumps(res, indent=2, default=str))
        return 1 if any(v["status"] == "error" for v in res.values()) else 0

    if args.command == "diff":
        from .operators.diff import dev_prod_diff

        res = dev_prod_diff(
            eng.spark, args.table, args.left_schema, args.right_schema,
            limit=args.limit if args.limit is not None else 100,
        )
        if args.format == "markdown":
            # PR-comment rendering (pr_data_diff.sh:83-118 table shape)
            from .operators.reports import data_diff_markdown

            print(data_diff_markdown([res]), end="")
            return 0
        print(res.summary_line)
        if res.sample is not None:
            for row in res.sample.collect():
                print(json.dumps(row.asDict(), default=str))
        return 0

    if args.command == "run-operation":
        from .plans.macros import run_operation

        eng.register_sources()
        out = run_operation(eng, args.macro_name, json.loads(args.args))
        if out:
            print(out)
        return 0

    if args.command == "orphans":
        from .operators.schema_diff import orphan_relations

        manifest = eng.compile()
        orphans = orphan_relations(eng.spark, args.schema, manifest)
        print(json.dumps({"schema": args.schema, "orphans": orphans}))
        return 0

    if args.command == "create-schema":
        # S14: ephemeral CI namespace (reference scripts/create_bq_dataset.sh:7).
        # --owner records the owning principal as a DBPROPERTY — the
        # Spark-catalog stand-in for the reference's ACL hardening
        # (create_bq_dataset.sh:12-43 strips dataset ACLs down to the
        # CI principal; Spark catalogs have no native ACLs, so access
        # control lives in the storage/catalog layer — Ranger, Unity,
        # or bucket IAM — keyed off exactly this owner property).
        props = f" WITH DBPROPERTIES ('owner'='{args.owner}')" if args.owner else ""
        eng.spark.sql(f"CREATE DATABASE IF NOT EXISTS {args.schema}{props}")
        print(f"created schema {args.schema}"
              + (f" (owner={args.owner})" if args.owner else ""))
        return 0

    if args.command == "drop-schema":
        # S14: teardown (reference scripts/drop_bq_dataset.sh:6, ci.yml:195-197)
        eng.spark.sql(f"DROP DATABASE IF EXISTS {args.schema} CASCADE")
        eng.purge_catalog_schema(args.schema)
        print(f"dropped schema {args.schema}")
        return 0

    if args.command == "schema-diff":
        from .operators.schema_diff import table_schema_diff

        d = table_schema_diff(
            eng.spark,
            f"{args.left_schema}.{args.table}",
            f"{args.right_schema}.{args.table}",
        )
        if args.format == "markdown":
            # PR-comment rendering (pr_schema_diff.sh:178-305 shape)
            from .operators.reports import schema_diff_markdown

            print(schema_diff_markdown([(args.table, d, False)]), end="")
            return 0
        print(json.dumps({
            "added": d.added,
            "removed": d.removed,
            "type_changed": d.type_changed,
            "nullability_changed": d.nullability_changed,
        }))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
