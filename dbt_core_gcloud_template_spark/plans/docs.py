"""Static docs generation (SURVEY.md §2.11 E8; reference
`dbt docs generate --static`, entrypoint.sh:144-167): render the
manifest into one self-contained HTML file."""

from __future__ import annotations

import html

from .manifest import Manifest

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; color: #1a1a2e; }}
h1 {{ border-bottom: 2px solid #ccc; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
td, th {{ border: 1px solid #ccc; padding: 4px 10px; text-align: left; }}
code {{ background: #f4f4f4; padding: 1px 4px; }}
details {{ margin: .5rem 0; }}
</style></head><body>
<h1>{title}</h1>
<p>target: <code>{target}</code> · {n} nodes</p>
{sections}
</body></html>"""


def render_docs(manifest: Manifest) -> str:
    sections = []
    by_type: dict[str, list] = {}
    for node in manifest.nodes.values():
        by_type.setdefault(node.resource_type, []).append(node)
    for rtype in ("source", "seed", "model", "snapshot", "test", "exposure"):
        nodes = sorted(by_type.get(rtype, []), key=lambda n: n.unique_id)
        if not nodes:
            continue
        rows = []
        for n in nodes:
            deps = ", ".join(n.depends_on) or "—"
            cols = (
                "".join(
                    f"<li><code>{html.escape(c)}</code> {html.escape(d or '')}</li>"
                    for c, d in n.columns.items()
                )
                if n.columns
                else ""
            )
            sql = (
                f"<details><summary>compiled SQL</summary>"
                f"<pre>{html.escape(n.compiled_sql)}</pre></details>"
                if n.compiled_sql
                else ""
            )
            rows.append(
                f"<tr><td><code>{html.escape(n.unique_id)}</code><br>"
                f"{html.escape(n.description or '')}<ul>{cols}</ul>{sql}</td>"
                f"<td><code>{html.escape(n.fqn)}</code></td>"
                f"<td>{html.escape(n.materialized)}</td>"
                f"<td>{html.escape(deps)}</td></tr>"
            )
        sections.append(
            f"<h2>{rtype}s</h2><table><tr><th>node</th><th>relation</th>"
            f"<th>materialized</th><th>depends on</th></tr>{''.join(rows)}</table>"
        )
    return _PAGE.format(
        title=f"{manifest.project_name} — docs",
        target=manifest.target,
        n=len(manifest.nodes),
        sections="\n".join(sections),
    )


def write_docs(manifest: Manifest, path: str) -> None:
    with open(path, "w") as f:
        f.write(render_docs(manifest))


def serve_docs(directory: str, port: int = 8080, host: str = "127.0.0.1"):
    """S16→S17: serve the generated docs directory over HTTP (the
    engine analog of the reference's Flask docs viewer,
    docs-viewer/app.py:25-31, which serves index.html from the
    artifact bucket with a short Cache-Control).  stdlib http.server —
    no web-framework dependency; same 60s cache header.

    Returns a started ThreadingHTTPServer (daemon thread); callers own
    ``.shutdown()``.  Pass port=0 to bind an ephemeral port (tests);
    the bound port is at ``server.server_address[1]``.
    """
    import functools
    import http.server
    import threading

    class Handler(http.server.SimpleHTTPRequestHandler):
        def end_headers(self):  # mirror the viewer's CACHE_CONTROL
            self.send_header("Cache-Control", "public, max-age=60")
            super().end_headers()

        def log_message(self, *a):  # quiet: this runs inside the CLI
            pass

    server = http.server.ThreadingHTTPServer(
        (host, port), functools.partial(Handler, directory=directory)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
