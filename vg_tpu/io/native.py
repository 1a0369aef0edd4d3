"""Native serialization of vg_tpu artifacts (graph, haplotype text,
minimizer index) as npz bundles.

The reference stores each index as its own sdsl/simple-sds file keyed by a
loader/saver registry (reference: src/io/register_loader_saver_*.cpp,
Appendix C of SURVEY.md). vg_tpu artifacts are plain arrays, so the
container is a compressed npz with a JSON metadata entry; one bundle per
artifact, same one-file-per-index workflow (.vgz graph, .hpt haplotype
text, .min minimizer index — extensions are conventions, the magic is in
the ``kind`` field).
"""
from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

from ..graph.arraygraph import ArrayGraph, PathMeta
from ..index.haplotypes import HaplotypeMeta, HaplotypeSet
from ..index.minimizer import MinimizerIndex

FORMAT_VERSION = 1


# ----------------------------------------------------------------- graph

def save_graph(path: str, g: ArrayGraph) -> None:
    meta = {
        "kind": "vg_tpu.graph",
        "version": FORMAT_VERSION,
        "paths": [
            {"name": m.name, "sense": m.sense, "sample": m.sample,
             "locus": m.locus, "haplotype": m.haplotype,
             "is_circular": m.is_circular}
            for m in g.path_meta],
    }
    np.savez_compressed(
        path, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        node_id=g.node_id, seq=g.seq, seq_start=g.seq_start,
        edge_pairs=g.edge_pairs, path_steps=g.path_steps,
        path_start=g.path_start)


def _read_meta(data) -> dict:
    return json.loads(bytes(data["meta"]).decode())


def load_graph(path: str) -> ArrayGraph:
    data = np.load(path)
    meta = _read_meta(data)
    assert meta["kind"] == "vg_tpu.graph", f"not a graph file: {path}"
    metas = [PathMeta(p["name"], p["sense"], p["sample"], p["locus"],
                      p["haplotype"], p["is_circular"])
             for p in meta["paths"]]
    return ArrayGraph(
        node_id=data["node_id"], seq=data["seq"],
        seq_start=data["seq_start"], edge_pairs=data["edge_pairs"],
        path_meta=metas, path_steps=data["path_steps"],
        path_start=data["path_start"])


# ------------------------------------------------------------ haplotypes

def save_haplotypes(path: str, h: HaplotypeSet) -> None:
    meta = {
        "kind": "vg_tpu.haplotypes",
        "version": FORMAT_VERSION,
        "haps": [
            {"name": m.name, "sample": m.sample, "phase": m.phase,
             "contig": m.contig, "is_ref": m.is_ref}
            for m in h.metas],
    }
    np.savez_compressed(
        path, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        steps=h.steps, steps_start=h.steps_start)


def load_haplotypes(path: str, graph: ArrayGraph) -> HaplotypeSet:
    data = np.load(path)
    meta = _read_meta(data)
    assert meta["kind"] == "vg_tpu.haplotypes", f"not a haplotype file: {path}"
    metas = [HaplotypeMeta(m["name"], m["sample"], m["phase"], m["contig"],
                           m["is_ref"]) for m in meta["haps"]]
    steps = data["steps"]
    starts = data["steps_start"]
    walks = [steps[starts[i] : starts[i + 1]] for i in range(len(metas))]
    return HaplotypeSet(graph, metas, walks)


# -------------------------------------------------------------- minimizer

def save_minimizer(path: str, idx: MinimizerIndex) -> None:
    meta = {"kind": "vg_tpu.minimizer", "version": FORMAT_VERSION,
            "k": idx.k, "w": idx.w,
            "max_alt_positions": idx.max_alt_positions,
            "scheme": idx.scheme, "smer": idx.smer,
            "weight_iterations": idx.weight_iterations}
    extra = {}
    if idx.frequent is not None:
        extra["frequent"] = idx.frequent
    np.savez_compressed(
        path, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        keys=idx.keys, offsets=idx.offsets, pos_text=idx.pos_text,
        pos_rev=idx.pos_rev, **extra)


def load_minimizer(path: str) -> MinimizerIndex:
    data = np.load(path)
    meta = _read_meta(data)
    assert meta["kind"] == "vg_tpu.minimizer", f"not a minimizer file: {path}"
    idx = MinimizerIndex(meta["k"], meta["w"], meta["max_alt_positions"],
                         scheme=meta.get("scheme", "minimizer"),
                         smer=meta.get("smer", 18),
                         frequent=(data["frequent"]
                                   if "frequent" in data else None),
                         weight_iterations=meta.get("weight_iterations", 3))
    idx.keys = data["keys"]
    idx.offsets = data["offsets"]
    idx.pos_text = data["pos_text"]
    idx.pos_rev = data["pos_rev"]
    return idx
