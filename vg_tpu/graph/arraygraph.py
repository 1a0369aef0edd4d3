"""ArrayGraph — the pangenome graph as immutable structure-of-arrays.

This is vg_tpu's answer to the reference's HandleGraph hierarchy
(reference: src/handle.hpp:1-45 re-exporting libhandlegraph; concrete
bdsg::HashGraph / PackedGraph / XG). Instead of an interface over pointer
structures, the graph is a frozen set of dense arrays:

- ``seq`` / ``seq_start``: concatenated node sequences (base codes 0..4)
- ``adj_*``: CSR adjacency over *handles* (node visits with orientation),
  so `follow(h)` is one slice — the bidirected semantics of
  handlegraph's follow_edges
- paths as runs of handles with per-path offsets

The layout uploads directly to device HBM (`device_arrays()`); mutation
happens in ``GraphBuilder`` (host, dict-backed) and freezes into this form.

Handle encoding: ``handle = node_index * 2 + orientation`` where
orientation 0 = forward, 1 = reverse (matching handlegraph's packed
number_bool_packing). ``node_index`` is dense [0, n); external node ids
are kept in ``node_id`` (sorted ascending) for interchange.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import dna

# path sense, mirroring handlegraph's PathSense (GENERIC/REFERENCE/HAPLOTYPE)
SENSE_GENERIC = 0
SENSE_REFERENCE = 1
SENSE_HAPLOTYPE = 2


def flip(handle: int) -> int:
    return handle ^ 1


@dataclass(slots=True)
class PathMeta:
    name: str
    sense: int = SENSE_GENERIC
    sample: str = ""
    locus: str = ""
    haplotype: int = 0
    is_circular: bool = False


class ArrayGraph:
    """Immutable bidirected sequence graph."""

    def __init__(
        self,
        node_id: np.ndarray,
        seq: np.ndarray,
        seq_start: np.ndarray,
        edge_pairs: np.ndarray,  # (m, 2) int64 handle pairs, canonicalized
        path_meta: List[PathMeta],
        path_steps: np.ndarray,  # concatenated handles
        path_start: np.ndarray,  # (p+1,)
    ):
        self.node_id = node_id
        self.seq = seq
        self.seq_start = seq_start
        self.edge_pairs = edge_pairs
        self.path_meta = path_meta
        self.path_steps = path_steps
        self.path_start = path_start

        n = len(node_id)
        self._id_to_idx: Dict[int, int] = {int(v): i for i, v in enumerate(node_id)}
        self._path_by_name: Dict[str, int] = {
            m.name: i for i, m in enumerate(path_meta)
        }

        # directed adjacency over handles: arcs h -> h2 for each edge both ways
        if len(edge_pairs):
            fr = np.concatenate([edge_pairs[:, 0], edge_pairs[:, 1] ^ 1])
            to = np.concatenate([edge_pairs[:, 1], edge_pairs[:, 0] ^ 1])
            arcs = np.unique(np.stack([fr, to], axis=1), axis=0)
        else:
            arcs = np.zeros((0, 2), dtype=np.int64)
        order = np.lexsort((arcs[:, 1], arcs[:, 0]))
        arcs = arcs[order]
        self.adj_to = arcs[:, 1].astype(np.int64)
        self.adj_start = np.zeros(2 * n + 1, dtype=np.int64)
        np.add.at(self.adj_start, arcs[:, 0] + 1, 1)
        np.cumsum(self.adj_start, out=self.adj_start)

    # -- basic queries ------------------------------------------------------

    @property
    def node_count(self) -> int:
        return len(self.node_id)

    @property
    def edge_count(self) -> int:
        return len(self.edge_pairs)

    @property
    def path_count(self) -> int:
        return len(self.path_meta)

    @property
    def total_seq_len(self) -> int:
        return int(self.seq_start[-1])

    def idx(self, node_id: int) -> int:
        return self._id_to_idx[node_id]

    def has_node(self, node_id: int) -> bool:
        return node_id in self._id_to_idx

    def handle(self, node_id: int, is_reverse: bool = False) -> int:
        return self._id_to_idx[node_id] * 2 + int(is_reverse)

    def handle_node_id(self, handle: int) -> int:
        return int(self.node_id[handle >> 1])

    def handle_is_reverse(self, handle: int) -> bool:
        return bool(handle & 1)

    def node_len_idx(self, idx) -> np.ndarray | int:
        return self.seq_start[np.asarray(idx) + 1] - self.seq_start[np.asarray(idx)]

    def node_len(self, node_id: int) -> int:
        i = self._id_to_idx[node_id]
        return int(self.seq_start[i + 1] - self.seq_start[i])

    def handle_len(self, handle: int) -> int:
        i = handle >> 1
        return int(self.seq_start[i + 1] - self.seq_start[i])

    def node_seq_codes(self, node_id: int) -> np.ndarray:
        i = self._id_to_idx[node_id]
        return self.seq[self.seq_start[i] : self.seq_start[i + 1]]

    def handle_seq_codes(self, handle: int) -> np.ndarray:
        i = handle >> 1
        s = self.seq[self.seq_start[i] : self.seq_start[i + 1]]
        if handle & 1:
            return dna.revcomp_codes(s)
        return s

    def node_seq(self, node_id: int) -> str:
        return dna.decode(self.node_seq_codes(node_id))

    def handle_seq(self, handle: int) -> str:
        return dna.decode(self.handle_seq_codes(handle))

    def follow(self, handle: int) -> np.ndarray:
        """Handles reachable by continuing forward out of `handle`."""
        return self.adj_to[self.adj_start[handle] : self.adj_start[handle + 1]]

    def predecessors(self, handle: int) -> np.ndarray:
        return self.follow(flip(handle)) ^ 1

    def degree_out(self, handle: int) -> int:
        return int(self.adj_start[handle + 1] - self.adj_start[handle])

    def has_edge(self, h1: int, h2: int) -> bool:
        return h2 in self.follow(h1)

    # -- paths --------------------------------------------------------------

    def path_index(self, name: str) -> int:
        return self._path_by_name[name]

    def has_path(self, name: str) -> bool:
        return name in self._path_by_name

    def path_handles(self, name_or_idx) -> np.ndarray:
        i = name_or_idx if isinstance(name_or_idx, int) else self._path_by_name[name_or_idx]
        return self.path_steps[self.path_start[i] : self.path_start[i + 1]]

    def path_name(self, idx: int) -> str:
        return self.path_meta[idx].name

    def path_seq(self, name_or_idx) -> str:
        return "".join(self.handle_seq(int(h)) for h in self.path_handles(name_or_idx))

    def path_len(self, name_or_idx) -> int:
        hs = self.path_handles(name_or_idx)
        return int(np.sum(self.node_len_idx(hs >> 1)))

    def path_step_offsets(self, name_or_idx) -> np.ndarray:
        """Cumulative base offset of each step along the path (len = steps+1)."""
        hs = self.path_handles(name_or_idx)
        lens = self.node_len_idx(hs >> 1)
        out = np.zeros(len(hs) + 1, dtype=np.int64)
        np.cumsum(lens, out=out[1:])
        return out

    # -- iteration / export --------------------------------------------------

    def iter_nodes(self) -> Iterator[Tuple[int, str]]:
        for i, nid in enumerate(self.node_id):
            yield int(nid), dna.decode(self.seq[self.seq_start[i] : self.seq_start[i + 1]])

    def iter_edges(self) -> Iterator[Tuple[int, bool, int, bool]]:
        """Yield (from_id, from_is_reverse, to_id, to_is_reverse)."""
        for h1, h2 in self.edge_pairs:
            yield (
                int(self.node_id[h1 >> 1]),
                bool(h1 & 1),
                int(self.node_id[h2 >> 1]),
                bool(h2 & 1),
            )

    # -- device upload -------------------------------------------------------

    def device_arrays(self):
        """Upload the graph's core arrays to the default device as a dict of
        jnp arrays (int32 where ranges allow; sequences uint8)."""
        import jax.numpy as jnp

        return {
            "seq": jnp.asarray(self.seq),
            "seq_start": jnp.asarray(self.seq_start.astype(np.int32)),
            "adj_start": jnp.asarray(self.adj_start.astype(np.int32)),
            "adj_to": jnp.asarray(self.adj_to.astype(np.int32)),
            "node_id": jnp.asarray(self.node_id),
        }

    # -- validation ----------------------------------------------------------

    def validate(self) -> List[str]:
        """Structural invariants; returns list of problems (empty = valid)."""
        problems: List[str] = []
        n = self.node_count
        if not np.all(np.diff(self.node_id) > 0):
            problems.append("node ids not strictly ascending")
        if np.any(self.edge_pairs >= 2 * n) or (len(self.edge_pairs) and np.any(self.edge_pairs < 0)):
            problems.append("edge handle out of range")
        for pi in range(self.path_count):
            hs = self.path_handles(pi)
            for a, b in zip(hs[:-1], hs[1:]):
                if not self.has_edge(int(a), int(b)):
                    problems.append(
                        f"path {self.path_meta[pi].name} step {a}->{b} has no edge"
                    )
                    break
        return problems


def canonical_edge(h1: int, h2: int) -> Tuple[int, int]:
    """Canonical form of a bidirected edge: the lexicographically smaller of
    (h1,h2) and (flip(h2),flip(h1))."""
    alt = (h2 ^ 1, h1 ^ 1)
    return min((h1, h2), alt)


class GraphBuilder:
    """Mutable host-side graph under construction; freeze() -> ArrayGraph.

    The reference mutates graphs through MutablePathDeletableHandleGraph
    (bdsg::HashGraph); here mutation is dict/list-based and cheap, and the
    frozen form is what every algorithm runs on.
    """

    def __init__(self):
        self.nodes: Dict[int, np.ndarray] = {}
        self.edges: set[Tuple[int, bool, int, bool]] = set()
        self.paths: List[Tuple[PathMeta, List[Tuple[int, bool]]]] = []
        self._next_id = 1

    def add_node(self, seq: str | np.ndarray, node_id: Optional[int] = None) -> int:
        if node_id is None:
            node_id = self._next_id
        if node_id in self.nodes:
            raise ValueError(f"duplicate node id {node_id}")
        codes = dna.encode(seq) if isinstance(seq, (str, bytes)) else np.asarray(seq, np.uint8)
        self.nodes[node_id] = codes
        self._next_id = max(self._next_id, node_id + 1)
        return node_id

    def add_edge(self, from_id: int, to_id: int,
                 from_rev: bool = False, to_rev: bool = False) -> None:
        self.edges.add((from_id, from_rev, to_id, to_rev))

    def add_path(self, name: str, steps: Sequence[Tuple[int, bool]],
                 sense: int = SENSE_GENERIC, sample: str = "", locus: str = "",
                 haplotype: int = 0, is_circular: bool = False) -> None:
        self.paths.append(
            (PathMeta(name, sense, sample, locus, haplotype, is_circular), list(steps))
        )

    def freeze(self) -> ArrayGraph:
        ids = np.array(sorted(self.nodes), dtype=np.int64)
        id_to_idx = {int(v): i for i, v in enumerate(ids)}
        seq_start = np.zeros(len(ids) + 1, dtype=np.int64)
        for i, nid in enumerate(ids):
            seq_start[i + 1] = seq_start[i] + len(self.nodes[int(nid)])
        seq = np.zeros(int(seq_start[-1]), dtype=np.uint8)
        for i, nid in enumerate(ids):
            seq[seq_start[i] : seq_start[i + 1]] = self.nodes[int(nid)]

        edge_set = set()
        for f_id, f_rev, t_id, t_rev in self.edges:
            h1 = id_to_idx[f_id] * 2 + int(f_rev)
            h2 = id_to_idx[t_id] * 2 + int(t_rev)
            edge_set.add(canonical_edge(h1, h2))
        edge_pairs = (
            np.array(sorted(edge_set), dtype=np.int64)
            if edge_set
            else np.zeros((0, 2), dtype=np.int64)
        )

        metas: List[PathMeta] = []
        steps_all: List[int] = []
        path_start = [0]
        for meta, steps in self.paths:
            metas.append(meta)
            for nid, rev in steps:
                steps_all.append(id_to_idx[nid] * 2 + int(rev))
            path_start.append(len(steps_all))
        return ArrayGraph(
            node_id=ids,
            seq=seq,
            seq_start=seq_start,
            edge_pairs=edge_pairs,
            path_meta=metas,
            path_steps=np.array(steps_all, dtype=np.int64),
            path_start=np.array(path_start, dtype=np.int64),
        )
