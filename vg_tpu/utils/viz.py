"""Graph visualization: Graphviz dot output (vg view -d role, reference:
src/subcommand/view_main.cpp dot emitters; full cairo viz out of scope)."""
from __future__ import annotations

from typing import Optional

from ..graph.arraygraph import ArrayGraph


def to_dot(g: ArrayGraph, max_nodes: int = 2000,
           show_sequences: bool = True) -> str:
    lines = ["digraph graphname {", "    rankdir=LR;",
             "    node [shape=box];"]
    n = min(g.node_count, max_nodes)
    for i in range(n):
        nid = int(g.node_id[i])
        label = f"{nid}"
        if show_sequences:
            s = g.node_seq(nid)
            label += ":" + (s if len(s) <= 12 else s[:10] + "..")
        lines.append(f'    n{nid} [label="{label}"];')
    shown = {int(g.node_id[i]) for i in range(n)}
    for f_id, f_rev, t_id, t_rev in g.iter_edges():
        if f_id in shown and t_id in shown:
            attrs = []
            if f_rev:
                attrs.append("arrowtail=inv")
            if t_rev:
                attrs.append("arrowhead=inv")
            a = f" [{','.join(attrs)}]" if attrs else ""
            lines.append(f"    n{f_id} -> n{t_id}{a};")
    for pi, meta in enumerate(g.path_meta[:8]):
        hs = g.path_handles(pi)
        if len(hs) == 0:
            continue
        lines.append(f'    path_{pi} [label="{meta.name}", shape=plaintext];')
    lines.append("}")
    return "\n".join(lines) + "\n"
