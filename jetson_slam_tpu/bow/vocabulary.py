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
        gzip-compressed transparently (bundled vocabularies ship small)."""
        with _open_text(path, "wt") as f:
            f.write(f"{self.k} {self.L} 0 0\n")
            order = self._dfs_order()
            # parent references must use the id each node gets from its
            # POSITION in the file (load_text numbers nodes by line order),
            # not the in-memory numbering
            newid = {node: i for i, node in enumerate(order)}
            for node in order:
                if node == 0:
                    continue
                parent = newid[self._parent_of(node)]
                d = " ".join(str(int(b)) for b in self.centroids[node])
                is_leaf = 1 if self.is_leaf[node] else 0
                wid = self.word_id[node]
                weight = self.weights[wid] if wid >= 0 else 0.0
                f.write(f"{parent} {is_leaf} {d} {weight}\n")

    def _parent_of(self, node):
        if not hasattr(self, "_parents"):
            par = np.full(len(self.centroids), -1, np.int64)
            for n in range(len(self.children)):
                for c in self.children[n]:
                    if c >= 0:
                        par[c] = n
            self._parents = par
        return int(self._parents[node])

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
    def load_text(path):
        """Load DBoW2 text vocabulary (ORBVocabulary::loadFromTextFile).
        .gz paths are decompressed transparently."""
        with _open_text(path, "rt") as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            children_l = [[-1] * k]
            cent_l = [np.zeros(32, np.uint8)]
            leaf_l = [False]
            parent_l = [-1]
            weight_l = [0.0]
            for line in f:
                vals = line.split()
                if len(vals) < 35:
                    continue
                parent = int(vals[0])
                is_leaf = bool(int(vals[1]))
                desc = np.array([int(x) for x in vals[2:34]], np.uint8)
                weight = float(vals[34])
                node = len(cent_l)
                cent_l.append(desc)
                leaf_l.append(is_leaf)
                parent_l.append(parent)
                weight_l.append(weight)
                children_l.append([-1] * k)
                for slot in range(k):
                    if children_l[parent][slot] < 0:
                        children_l[parent][slot] = node
                        break
        children = np.array(children_l, np.int32)
        centroids = np.stack(cent_l)
        is_leaf = np.array(leaf_l)
        word_id = np.full(len(cent_l), -1, np.int32)
        leaves = np.flatnonzero(is_leaf)
        word_id[leaves] = np.arange(len(leaves), dtype=np.int32)
        weights = np.array(weight_l, np.float32)[leaves]
        # node levels via parent chains
        node_level = np.zeros(len(cent_l), np.int32)
        for n in range(1, len(cent_l)):
            node_level[n] = node_level[parent_l[n]] + 1
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
