"""Vectorized binary BoW vocabulary (DBoW2 replacement).

TPU re-design of Thirdparty/DBoW2 (TemplatedVocabulary.h, FORB.cpp):
the hierarchical k-ary tree is flattened to arrays (children table +
centroid table), descriptor->word assignment descends the tree with batched
XOR+popcount argmins (SURVEY.md §2.3 "vectorized vocabulary"), and BoW
vectors for moderate vocabularies are DENSE word-weight rows so database
scoring is a single matmul on the MXU.

Supports:
- `train` — binary k-medians vocabulary builder (the reference ships a
  pre-trained ORBvoc.txt; absent from the snapshot, so we can train our own)
- `load_text` — DBoW2 text format loader (ORBvoc.txt compatibility)
- `transform` — descriptors -> (word ids, tf weights, node ids at levelsup)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _popcount_u8(x):
    """Vectorized popcount over uint8 arrays."""
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


class Vocabulary:
    """Flattened hierarchical binary vocabulary.

    Arrays:
      children: (n_nodes, k) int32, -1 where absent
      centroids: (n_nodes, 32) uint8
      is_leaf: (n_nodes,) bool
      word_id: (n_nodes,) int32 (-1 for non-leaves)
      weights: (n_words,) float32 idf weights
      node_level: (n_nodes,) int32
    """

    def __init__(self, k, L, children, centroids, is_leaf, word_id, weights,
                 node_level, scoring="l1"):
        self.k = k
        self.L = L
        self.children = children
        self.centroids = centroids
        self.is_leaf = is_leaf
        self.word_id = word_id
        self.weights = weights
        self.node_level = node_level
        self.scoring = scoring
        self.n_words = len(weights)

    # ------------------------------------------------------------ training
    @staticmethod
    def train(descriptors: np.ndarray, k=10, L=3, seed=0, iters=8):
        """Binary k-medians tree (DBoW2 TemplatedVocabulary::create)."""
        rng = np.random.default_rng(seed)
        children_l, cent_l, leaf_l, level_l = [[-1] * k], [np.zeros(32, np.uint8)], [False], [0]

        def kmedians(descs, k):
            if len(descs) <= k:
                return descs.copy(), [descs[i:i + 1] for i in range(len(descs))]
            idx = rng.choice(len(descs), k, replace=False)
            cents = descs[idx].copy()
            for _ in range(iters):
                d = _hamming_np(descs, cents)
                assign = d.argmin(1)
                new = []
                for c in range(k):
                    members = descs[assign == c]
                    if len(members) == 0:
                        new.append(cents[c])
                        continue
                    bits = np.unpackbits(members, axis=1)
                    maj = (bits.mean(0) >= 0.5).astype(np.uint8)
                    new.append(np.packbits(maj))
                cents = np.stack(new)
            d = _hamming_np(descs, cents)
            assign = d.argmin(1)
            return cents, [descs[assign == c] for c in range(len(cents))]

        def build(node, descs, level):
            if level == L or len(descs) == 0:
                leaf_l[node] = True
                return
            cents, groups = kmedians(descs, k)
            for i, (c, g) in enumerate(zip(cents, groups)):
                child = len(cent_l)
                children_l.append([-1] * k)
                cent_l.append(c)
                leaf_l.append(False)
                level_l.append(level + 1)
                children_l[node][i] = child
                build(child, g, level + 1)

        build(0, descriptors.astype(np.uint8), 0)
        children = np.array(children_l, np.int32)
        centroids = np.stack(cent_l)
        is_leaf = np.array(leaf_l)
        node_level = np.array(level_l, np.int32)
        word_id = np.full(len(centroids), -1, np.int32)
        leaves = np.flatnonzero(is_leaf)
        word_id[leaves] = np.arange(len(leaves), dtype=np.int32)
        weights = np.ones(len(leaves), np.float32)  # idf set by add_idf
        voc = Vocabulary(k, L, children, centroids, is_leaf, word_id, weights,
                         node_level)
        voc._set_idf(descriptors)
        return voc

    def _set_idf(self, training_descs):
        """tf-idf weights like DBoW2 (weighting=TF_IDF)."""
        words = self.descriptors_to_words(training_descs)
        counts = np.bincount(words, minlength=self.n_words)
        n_docs = max(len(training_descs), 1)
        self.weights = np.log(n_docs / np.maximum(counts, 1)).astype(np.float32)
        self.weights[self.weights <= 0] = 1e-3

    # ------------------------------------------------------------- lookup
    def descriptors_to_words(self, descs: np.ndarray, levelsup=2):
        words, _, _ = self.transform(descs, levelsup)
        return words

    def transform(self, descs: np.ndarray, levelsup=2):
        """descs (N, 32) uint8 -> (word_ids (N,), weights (N,), node_ids (N,)).

        node_ids are the tree nodes `levelsup` levels above the leaves
        (DBoW2 transform(..., levelsup), used to bucket candidate matches in
        SearchByBoW).
        """
        descs = np.asarray(descs, np.uint8)
        N = len(descs)
        node = np.zeros(N, np.int64)
        node_at = np.zeros(N, np.int64)
        stop_level = max(self.L - levelsup, 0)
        for level in range(self.L):
            ch = self.children[node]               # (N, k)
            has = ch >= 0
            safe = np.where(has, ch, 0)
            cents = self.centroids[safe]           # (N, k, 32)
            d = _popcount_u8(cents ^ descs[:, None, :]).sum(-1).astype(np.int32)
            d = np.where(has, d, 1 << 30)
            nxt = safe[np.arange(N), d.argmin(1)]
            done = ~has.any(1)                     # already at a leaf
            node = np.where(done, node, nxt)
            if level + 1 == stop_level:
                node_at = node.copy()
        words = self.word_id[node]
        # unreachable safety: unmapped nodes -> word 0
        words = np.where(words >= 0, words, 0)
        return words.astype(np.int64), self.weights[words], node_at

    # ------------------------------------------------------------ vectors
    def bow_vector(self, descs: np.ndarray):
        """Dense L1-normalized tf-idf word histogram (n_words,) float32."""
        if len(descs) == 0:
            return np.zeros(self.n_words, np.float32)
        words, w, _ = self.transform(descs)
        vec = np.zeros(self.n_words, np.float32)
        np.add.at(vec, words, w)
        s = vec.sum()
        return vec / s if s > 0 else vec

    def sparse_bow(self, descs: np.ndarray):
        """Sparse L1-normalized tf-idf BoW: (sorted unique word ids (M,),
        weights (M,) float32).  Memory O(#descriptors) regardless of
        vocabulary size — the form the inverted-file KeyFrameDatabase
        stores (DBoW2 BowVector is exactly this sparse map)."""
        if len(descs) == 0:
            return np.array([], np.int64), np.array([], np.float32)
        words, w, _ = self.transform(descs)
        uniq, inv = np.unique(words, return_inverse=True)
        vec = np.zeros(len(uniq), np.float32)
        np.add.at(vec, inv, w.astype(np.float32))
        s = vec.sum()
        if s > 0:
            vec /= s
        return uniq.astype(np.int64), vec

    @staticmethod
    def l1_score(v1, v2):
        """DBoW2 L1Scoring: s = 1 - 0.5*|v1/|v1| - v2/|v2||_1 in [0, 1]."""
        return float(1.0 - 0.5 * np.abs(v1 - v2).sum())

    @staticmethod
    def l1_score_matrix(V1, V2):
        """Batched scoring: (A, W) x (B, W) -> (A, B) on device."""
        diff = jnp.abs(V1[:, None, :] - V2[None, :, :]).sum(-1)
        return 1.0 - 0.5 * diff

    # --------------------------------------------------------------- io
    def save_text(self, path):
        """DBoW2 text format (ORBvoc.txt compatible); .gz paths are
        gzip-compressed transparently.  Row assembly is vectorized so a
        1M-word vocabulary saves in seconds (the format is one node per
        line: parent is_leaf d0..d31 weight)."""
        order = np.asarray(self._dfs_order(), np.int64)
        # parent references must use the id each node gets from its
        # POSITION in the file (load_text numbers nodes by line order),
        # not the in-memory numbering
        newid = np.empty(len(order), np.int64)
        newid[order] = np.arange(len(order))
        nodes = order[1:]
        par = self._parents_table()
        rows = np.zeros((len(nodes), 35), np.float64)
        rows[:, 0] = newid[par[nodes]]
        rows[:, 1] = self.is_leaf[nodes]
        rows[:, 2:34] = self.centroids[nodes]
        wid = self.word_id[nodes]
        rows[:, 34] = np.where(wid >= 0, self.weights[np.maximum(wid, 0)], 0.0)
        with _open_text(path, "wt") as f:
            f.write(f"{self.k} {self.L} 0 0\n")
            np.savetxt(f, rows, fmt="%.10g")

    def _parents_table(self):
        if not hasattr(self, "_parents"):
            par = np.full(len(self.centroids), -1, np.int64)
            rs, cs = np.nonzero(self.children >= 0)
            par[self.children[rs, cs]] = rs
            self._parents = par
        return self._parents

    def _parent_of(self, node):
        return int(self._parents_table()[node])

    def _dfs_order(self):
        order, stack = [], [0]
        while stack:
            n = stack.pop()
            order.append(n)
            for c in self.children[n][::-1]:
                if c >= 0:
                    stack.append(int(c))
        return order

    @staticmethod
    def load_text(path, cache=True):
        """Load DBoW2 text vocabulary (ORBVocabulary::loadFromTextFile).
        .gz paths are decompressed transparently.

        Sized for the real 1M-word / ~140 MB ORBvoc.txt the reference loads
        at startup (System.cpp:72-79, ORBVocabulary.h:31-32): the body is
        parsed in ONE `np.fromstring` pass (every line after the header is
        exactly 35 whitespace-separated numbers) and the result is cached to
        a `<path>.npz` sidecar, so the first load is seconds and subsequent
        loads are a single np.load.  Pass cache=False to skip the sidecar.
        """
        import os
        npz = str(path) + ".npz"
        if cache and os.path.exists(npz) and \
                os.path.getmtime(npz) >= os.path.getmtime(path):
            with np.load(npz) as d:
                return Vocabulary(int(d["k"]), int(d["L"]), d["children"],
                                  d["centroids"], d["is_leaf"], d["word_id"],
                                  d["weights"], d["node_level"])
        with _open_text(path, "rt") as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            body = f.read()
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            vals = np.fromstring(body, dtype=np.float64, sep=" ")
        del body
        if vals.size % 35 != 0:  # tolerate ragged trailing junk
            vals = vals[: (vals.size // 35) * 35]
        rows = vals.reshape(-1, 35)
        N = len(rows) + 1                              # + implicit root
        parent = np.concatenate([[-1], rows[:, 0].astype(np.int64)])
        is_leaf = np.concatenate([[False], rows[:, 1] != 0])
        centroids = np.concatenate(
            [np.zeros((1, 32), np.uint8), rows[:, 2:34].astype(np.uint8)])
        node_weight = np.concatenate([[0.0], rows[:, 34]]).astype(np.float32)
        # children table: node ids are line order, so each parent's children
        # appear in encounter order -> slot = rank within parent
        children = np.full((N, k), -1, np.int32)
        nodes = np.arange(1, N, dtype=np.int64)
        order = np.argsort(parent[1:], kind="stable")
        p_sorted = parent[1:][order]
        deg = np.bincount(p_sorted, minlength=N)
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        rank = np.arange(N - 1) - starts[p_sorted]
        ok = rank < k
        children[p_sorted[ok], rank[ok]] = nodes[order][ok].astype(np.int32)
        word_id = np.full(N, -1, np.int32)
        leaves = np.flatnonzero(is_leaf)
        word_id[leaves] = np.arange(len(leaves), dtype=np.int32)
        weights = node_weight[leaves]
        # node levels: parents precede children in the format (ids are
        # creation order), so L+1 masked passes settle every level
        node_level = np.full(N, -1, np.int32)
        node_level[0] = 0
        for _ in range(L + 1):
            todo = node_level < 0
            ready = todo & (node_level[np.maximum(parent, 0)] >= 0)
            node_level[ready] = node_level[parent[ready]] + 1
            if not todo.any():
                break
        node_level[node_level < 0] = 0
        if cache:
            try:
                np.savez(npz, k=k, L=L, children=children,
                         centroids=centroids, is_leaf=is_leaf,
                         word_id=word_id, weights=weights,
                         node_level=node_level)
            except OSError:
                pass  # read-only install dir: cold parse each time
        return Vocabulary(k, L, children, centroids, is_leaf, word_id,
                          weights, node_level)


def _open_text(path, mode):
    if str(path).endswith(".gz"):
        import gzip
        return gzip.open(path, mode)
    return open(path, mode.rstrip("t") or "r")


def _hamming_np(a, b):
    """(N, 32) x (M, 32) -> (N, M) int Hamming distances."""
    return _popcount_u8(a[:, None, :] ^ b[None, :, :]).sum(-1).astype(np.int32)


_BUNDLED = {"small": "vocab_small.txt", "10k": "vocab_10k.txt.gz"}
_BUNDLED_CACHE: dict = {}


def bundled_names() -> tuple:
    """Names accepted by bundled_vocabulary (public accessor for CLIs)."""
    return tuple(_BUNDLED)


def bundled_vocabulary(name: str = "10k") -> "Vocabulary":
    """Bundled vocabularies trained on diverse synthetic ORB descriptors
    (examples/train_vocabulary.py) — the out-of-the-box stand-in for the
    reference's 140 MB ORBvoc.txt (System.cpp:72-79 loads it at startup;
    the file is not part of the reference snapshot).

    - "10k": k=10, L=4, 10,000 words (default; loop-closure grade)
    - "small": k=8, L=3, 512 words (fast; unit tests)

    Load a full DBoW2 ORBvoc.txt via Vocabulary.load_text for dataset-grade
    place recognition."""
    if name not in _BUNDLED_CACHE:
        import os
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "data", _BUNDLED[name])
        _BUNDLED_CACHE[name] = Vocabulary.load_text(path)
    return _BUNDLED_CACHE[name]


def small_vocabulary() -> "Vocabulary":
    """Bundled 512-word vocabulary (see bundled_vocabulary)."""
    return bundled_vocabulary("small")
