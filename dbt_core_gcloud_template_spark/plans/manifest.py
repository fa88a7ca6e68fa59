"""Manifest: the compiled DAG artifact (SURVEY.md §1.1 row 8; reference
entrypoint.sh:170-191 uploads it, scripts/ci_build.sh:12-32 restores it
for state selection).

Holds every node (model/seed/snapshot/test/source) with its checksum,
dependencies, and resolved relation FQN.  Serialized to
``manifest.json`` after each run; a prior manifest powers
``state:modified+`` selection (E3) and ``--defer`` (E4).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class Node:
    unique_id: str  # model.<proj>.<name> / seed... / snapshot... / test...
    name: str
    resource_type: str  # model | seed | snapshot | test | source
    schema: str  # target schema (database in Spark terms)
    alias: str  # relation name
    raw_sql: str = ""
    compiled_sql: str = ""
    config: dict[str, Any] = field(default_factory=dict)
    depends_on: list[str] = field(default_factory=list)
    checksum: str = ""
    description: str = ""
    columns: dict[str, str] = field(default_factory=dict)  # name -> description
    tags: list[str] = field(default_factory=list)

    @property
    def fqn(self) -> str:
        return f"{self.schema}.{self.alias}"

    @property
    def enabled(self) -> bool:
        return bool(self.config.get("enabled", True))

    @property
    def materialized(self) -> str:
        return self.config.get("materialized", "view")


def checksum_of(raw_sql: str, config: dict[str, Any]) -> str:
    payload = raw_sql + "\n--config--\n" + json.dumps(config, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()


@dataclass
class Manifest:
    project_name: str
    target: str
    nodes: dict[str, Node] = field(default_factory=dict)

    def add(self, node: Node) -> None:
        self.nodes[node.unique_id] = node

    # -- graph ---------------------------------------------------------------
    def children_map(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {uid: [] for uid in self.nodes}
        for uid, node in self.nodes.items():
            for dep in node.depends_on:
                if dep in out:
                    out[dep].append(uid)
        return out

    def descendants(self, uids: set[str]) -> set[str]:
        children = self.children_map()
        seen = set(uids)
        stack = list(uids)
        while stack:
            for child in children.get(stack.pop(), []):
                if child not in seen:
                    seen.add(child)
                    stack.append(child)
        return seen

    def topo_order(self, selected: set[str] | None = None) -> list[str]:
        """Kahn topological sort restricted to ``selected`` (default: all)."""
        universe = set(self.nodes) if selected is None else set(selected)
        indeg = {
            uid: sum(1 for d in self.nodes[uid].depends_on if d in universe)
            for uid in universe
        }
        ready = sorted(uid for uid, d in indeg.items() if d == 0)
        children = self.children_map()
        order: list[str] = []
        while ready:
            uid = ready.pop(0)
            order.append(uid)
            for child in children.get(uid, []):
                if child in universe:
                    indeg[child] -= 1
                    if indeg[child] == 0:
                        ready.append(child)
            ready.sort()
        if len(order) != len(universe):
            cyc = universe - set(order)
            raise ValueError(f"dependency cycle involving: {sorted(cyc)}")
        return order

    # -- state selection (E3) -------------------------------------------------
    def modified_vs(self, prior: "Manifest | None") -> set[str]:
        """Nodes whose checksum changed (or that are new) vs a prior manifest."""
        if prior is None:
            return set(self.nodes)
        out = set()
        for uid, node in self.nodes.items():
            old = prior.nodes.get(uid)
            if old is None or old.checksum != node.checksum:
                out.add(uid)
        return out

    def select(
        self, selector: str | None, prior: "Manifest | None" = None
    ) -> set[str]:
        """dbt-style selection: None → all; ``state:modified+`` → changed +
        descendants; ``name`` / ``name+`` / ``tag:x`` → by name/tag."""
        if not selector:
            return set(self.nodes)
        parts = [p.strip() for p in selector.split(",") if p.strip()]
        out: set[str] = set()
        for part in parts:
            plus = part.endswith("+")
            if plus:
                part = part[:-1]
            if part == "state:modified":
                base = self.modified_vs(prior)
            elif part.startswith("tag:"):
                tag = part[4:]
                base = {u for u, n in self.nodes.items() if tag in n.tags}
            elif part.startswith("source:"):
                base = {
                    u
                    for u, n in self.nodes.items()
                    if n.resource_type == "source"
                    and (part[7:] in (n.name, f"{u.split('.')[1]}.{n.name}", u))
                }
            else:
                base = {
                    u
                    for u, n in self.nodes.items()
                    if n.name == part or u == part
                }
            out |= self.descendants(base) if plus else base
        return out

    # -- serialization -------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "project_name": self.project_name,
                "target": self.target,
                "nodes": {uid: asdict(n) for uid, n in self.nodes.items()},
            },
            indent=2,
            default=str,
        )

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def read(cls, path: str) -> "Manifest":
        with open(path) as f:
            doc = json.load(f)
        m = cls(project_name=doc["project_name"], target=doc["target"])
        for uid, nd in doc["nodes"].items():
            m.add(Node(**nd))
        return m
