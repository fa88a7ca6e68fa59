"""Project loader (SURVEY.md §3.1 step 1; reference layout parity).

A project directory mirrors the reference template:

    project.yml          — name, profile, per-folder model defaults, vars
    profiles.yml         — targets (dev/ci/prod): schema, threads
    models/**/*.sql      — SELECT + {{ config(...) }} header
    models/**/*.yml      — schema tests + source declarations
    seeds/*.csv          — version-controlled data (S3)
    snapshots/*.sql      — SCD2 declarations (S8)
    macros/*.sql         — Jinja macros (X1)

YAML files are Jinja-rendered first (so ``{{ env_var(...) }}`` works
in source locations, like dbt profiles do).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jinja2
import yaml


@dataclass
class SourceTable:
    source_name: str
    name: str
    schema: str
    location: str | None = None  # external parquet/csv path
    format: str = "parquet"
    loaded_at_field: str | None = None
    # dbt `event_time`: the column sample mode / microbatch windows cut on
    event_time: str | None = None
    freshness: dict[str, Any] = field(default_factory=dict)
    description: str = ""
    # Declared logical column types (dbt `columns: [{name, data_type}]`).
    # When present, the registered source relation presents exactly these
    # types regardless of the physical file's encoding — see
    # Engine.register_sources.
    column_types: dict[str, str] = field(default_factory=dict)
    # dbt tests declared on source columns (run against the raw feed)
    column_tests: dict[str, list] = field(default_factory=dict)

    @property
    def unique_id(self) -> str:
        return f"source.{self.source_name}.{self.name}"


@dataclass
class ColumnSpec:
    name: str
    description: str = ""
    tests: list[Any] = field(default_factory=list)
    data_type: str | None = None  # declared type (model contracts)


@dataclass
class ModelFile:
    name: str
    path: str  # absolute path to .sql (or .py for Python models)
    raw_sql: str
    subdir: str  # e.g. "staging", "marts", "" for root
    description: str = ""
    columns: list[ColumnSpec] = field(default_factory=list)
    model_tests: list[Any] = field(default_factory=list)  # model-level (X7)
    language: str = "sql"  # "sql" | "python" (dbt 1.3 Python models)
    yml_config: dict[str, Any] = field(default_factory=dict)  # models/*.yml config:


@dataclass
class SeedFile:
    name: str
    path: str


@dataclass
class SnapshotFile:
    name: str
    path: str
    raw_sql: str


@dataclass
class Exposure:
    """Downstream-consumer metadata node (reference
    models/exposures.yml:3-17) — DAG leaf for lineage/docs, never
    executed."""

    name: str
    type: str = "application"  # dashboard | notebook | analysis | ml | application
    description: str = ""
    url: str = ""
    maturity: str = ""
    owner: dict[str, str] = field(default_factory=dict)
    depends_on: list[str] = field(default_factory=list)  # raw ref('x') strings


@dataclass
class UnitTest:
    """dbt 1.8 unit test (public semantics): run a model's SQL against
    declared fixture inputs, compare to expected rows — no warehouse
    state involved."""

    name: str
    model: str
    given: list[dict[str, Any]] = field(default_factory=list)
    expect: list[dict[str, Any]] = field(default_factory=list)
    description: str = ""


@dataclass
class Project:
    root: str
    name: str
    profile: str
    model_defaults: dict[str, dict[str, Any]]  # subdir -> config
    vars: dict[str, Any]
    targets: dict[str, dict[str, Any]]
    default_target: str
    models: list[ModelFile] = field(default_factory=list)
    seeds: list[SeedFile] = field(default_factory=list)
    snapshots: list[SnapshotFile] = field(default_factory=list)
    sources: list[SourceTable] = field(default_factory=list)
    exposures: list[Exposure] = field(default_factory=list)
    unit_tests: list[UnitTest] = field(default_factory=list)
    macro_sql: str = ""  # concatenated macros/*.sql
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    # project.yml `seeds:` config (dbt: +column_types / +delimiter,
    # optionally nested under the project name or a seed's name)
    seed_defaults: dict[str, Any] = field(default_factory=dict)
    # selectors.yml: name -> {"definition": ..., "default": bool}
    selectors: dict[str, dict[str, Any]] = field(default_factory=dict)
    # project.yml `groups:` (dbt 1.5 model governance): name -> owner dict
    groups: dict[str, dict[str, Any]] = field(default_factory=dict)
    # project.yml `lint:` — style-rule config (the .sqlfluff analog);
    # None = section absent = style layer off (parse/YAML checks
    # always run regardless)
    lint_rules: dict[str, Any] | None = None

    def default_selector(self) -> Any:
        """Definition of the selector marked ``default: true`` (dbt
        applies it when no --select/--selector is given), else None."""
        for spec in self.selectors.values():
            if spec.get("default"):
                return spec["definition"]
        return None

    def seed_config(self, seed_name: str) -> dict[str, Any]:
        """Project-level seed config merged with the seed's own block."""
        out = {
            k: v
            for k, v in self.seed_defaults.items()
            if k != seed_name and not (isinstance(v, dict) and k in {s.name for s in self.seeds})
        }
        per_seed = self.seed_defaults.get(seed_name)
        if isinstance(per_seed, dict):
            out.update(per_seed)
        return out


def _render_yaml(path: str) -> dict[str, Any]:
    """Jinja-render then YAML-parse (env_var/var available, like dbt)."""
    with open(path) as f:
        raw = f.read()
    env = jinja2.Environment(undefined=jinja2.Undefined)
    rendered = env.from_string(raw).render(
        env_var=lambda k, d="": os.environ.get(k, d)
    )
    return yaml.safe_load(rendered) or {}


def _walk(root: str, ext: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if fn.endswith(ext):
                out.append(os.path.join(dirpath, fn))
    return out


def load_project(root: str) -> Project:
    cfg = _render_yaml(os.path.join(root, "project.yml"))
    profiles_path = os.path.join(root, "profiles.yml")
    profiles = _render_yaml(profiles_path) if os.path.exists(profiles_path) else {}
    profile_name = cfg.get("profile", cfg["name"])
    prof = profiles.get(profile_name, {})

    # per-folder model defaults: {"staging": {"materialized": "view"}, ...}
    model_defaults: dict[str, dict[str, Any]] = {}
    for subdir, conf in (cfg.get("models") or {}).items():
        model_defaults[subdir] = {
            k.lstrip("+"): v for k, v in (conf or {}).items()
        }

    def _strip_plus(d: Any) -> Any:
        if isinstance(d, dict):
            return {str(k).lstrip("+"): _strip_plus(v) for k, v in d.items()}
        return d

    seed_defaults = _strip_plus(cfg.get("seeds") or {})
    # dbt nests config under the project name; flatten that level
    if cfg["name"] in seed_defaults and isinstance(seed_defaults[cfg["name"]], dict):
        nested = seed_defaults.pop(cfg["name"])
        seed_defaults = {**seed_defaults, **nested}

    proj = Project(
        root=root,
        name=cfg["name"],
        profile=profile_name,
        model_defaults=model_defaults,
        vars=cfg.get("vars") or {},
        targets=prof.get("outputs") or {},
        default_target=prof.get("target", "dev"),
        on_run_start=list(cfg.get("on-run-start") or []),
        on_run_end=list(cfg.get("on-run-end") or []),
        seed_defaults=seed_defaults,
        # dbt 1.5 model governance: groups may live in project.yml
        # (dbt also allows models/*.yml `groups:`; both merge below)
        groups={
            g["name"]: g.get("owner") or {}
            for g in cfg.get("groups") or []
            if isinstance(g, dict) and "name" in g
        },
        lint_rules=cfg.get("lint") if isinstance(cfg.get("lint"), dict) else None,
    )

    # selectors.yml (dbt saved selectors): list of {name, definition,
    # default?, description?}
    sel_path = os.path.join(root, "selectors.yml")
    if os.path.exists(sel_path):
        for spec in _render_yaml(sel_path).get("selectors") or []:
            proj.selectors[spec["name"]] = {
                "definition": spec.get("definition"),
                "default": bool(spec.get("default", False)),
                "description": spec.get("description", ""),
            }

    models_dir = os.path.join(root, "models")
    col_specs: dict[str, tuple[str, list[ColumnSpec]]] = {}
    if os.path.isdir(models_dir):
        for path in _walk(models_dir, ".yml"):
            doc = _render_yaml(path)
            for g in doc.get("groups") or []:
                if isinstance(g, dict) and "name" in g:
                    proj.groups[g["name"]] = g.get("owner") or {}
            for src in doc.get("sources") or []:
                for tbl in src.get("tables") or []:
                    ext = tbl.get("external") or {}
                    fresh = tbl.get("freshness") or src.get("freshness") or {}
                    proj.sources.append(
                        SourceTable(
                            source_name=src["name"],
                            name=tbl["name"],
                            schema=src.get("schema", src["name"]),
                            location=ext.get("location"),
                            format=ext.get("format", "parquet"),
                            loaded_at_field=tbl.get("loaded_at_field")
                            or src.get("loaded_at_field"),
                            event_time=tbl.get("event_time")
                            or (tbl.get("config") or {}).get("event_time"),
                            freshness=fresh,
                            description=tbl.get("description", ""),
                            column_types={
                                c["name"]: c["data_type"]
                                for c in tbl.get("columns") or []
                                if c.get("data_type")
                            },
                            column_tests={
                                c["name"]: c["tests"]
                                for c in tbl.get("columns") or []
                                if c.get("tests")
                            },
                        )
                    )
            for ut in doc.get("unit_tests") or []:
                proj.unit_tests.append(
                    UnitTest(
                        name=ut["name"],
                        model=ut["model"],
                        given=list(ut.get("given") or []),
                        expect=list((ut.get("expect") or {}).get("rows") or []),
                        description=ut.get("description", ""),
                    )
                )
            for exp in doc.get("exposures") or []:
                proj.exposures.append(
                    Exposure(
                        name=exp["name"],
                        type=exp.get("type", "application"),
                        description=exp.get("description", ""),
                        url=exp.get("url", ""),
                        maturity=exp.get("maturity", ""),
                        owner=exp.get("owner") or {},
                        depends_on=list(exp.get("depends_on") or []),
                    )
                )
            for mdl in doc.get("models") or []:
                if not isinstance(mdl, dict) or "name" not in mdl:
                    raise ValueError(
                        f"{path}: models entries must be mappings with a name"
                    )
                cols = [
                    ColumnSpec(
                        name=c["name"],
                        description=c.get("description", ""),
                        tests=c.get("tests") or [],
                        data_type=c.get("data_type"),
                    )
                    for c in mdl.get("columns") or []
                ]
                col_specs[mdl["name"]] = (
                    mdl.get("description", ""),
                    cols,
                    mdl.get("tests") or [],
                    mdl.get("config") or {},
                )
        for path in _walk(models_dir, ".sql") + _walk(models_dir, ".py"):
            name = os.path.splitext(os.path.basename(path))[0]
            subdir = os.path.relpath(os.path.dirname(path), models_dir)
            subdir = "" if subdir == "." else subdir.split(os.sep)[0]
            desc, cols, mtests, ycfg = col_specs.get(name, ("", [], [], {}))
            with open(path) as f:
                proj.models.append(
                    ModelFile(
                        name=name,
                        path=path,
                        raw_sql=f.read(),
                        subdir=subdir,
                        description=desc,
                        columns=cols,
                        model_tests=mtests,
                        language="python" if path.endswith(".py") else "sql",
                        yml_config=ycfg,
                    )
                )

    seeds_dir = os.path.join(root, "seeds")
    if os.path.isdir(seeds_dir):
        for path in _walk(seeds_dir, ".csv"):
            name = os.path.splitext(os.path.basename(path))[0]
            proj.seeds.append(SeedFile(name=name, path=path))

    snaps_dir = os.path.join(root, "snapshots")
    if os.path.isdir(snaps_dir):
        for path in _walk(snaps_dir, ".sql"):
            name = os.path.splitext(os.path.basename(path))[0]
            with open(path) as f:
                proj.snapshots.append(
                    SnapshotFile(name=name, path=path, raw_sql=f.read())
                )

    macros_dir = os.path.join(root, "macros")
    if os.path.isdir(macros_dir):
        parts = []
        for path in _walk(macros_dir, ".sql"):
            with open(path) as f:
                parts.append(f.read())
        proj.macro_sql = "\n".join(parts)

    return proj
