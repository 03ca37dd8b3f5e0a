"""Bag-of-words place recognition as dense TPU math.

TPU-native replacement for DBoW2 (reference Thirdparty/DBoW2 +
include/ORBVocabulary.h + src/KeyFrameDatabase.cc). The reference walks a
6-level-10-branch vocabulary tree per descriptor (pointer chasing) and keeps
an inverted index word->keyframes. Here the vocabulary is a flat codebook of
V binary words stored as +-1 int8 rows; quantization of all N descriptors of
a frame is ONE (N,256)x(256,V) matmul on the MXU (Hamming distance is an
affine function of the +-1 dot product), and database queries are one
(V,)x(V,Kmax) matmul against the stored tf-idf matrix.

Scoring follows DBoW2's L1 score (TemplatedVocabulary::score):
  s(v, w) = 1 - 0.5 * sum_i |v_i - w_i|  with v, w L1-normalized,
which equals sum_i min(v_i, w_i) for nonneg vectors — computed batched.

`KeyFrameDatabase` mirrors DetectNBestCandidates /
DetectRelocalizationCandidates semantics (reference
src/KeyFrameDatabase.cc:612,783): common-word gating, min-score thresholds,
and top-k retrieval — as masked dense reductions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def train_vocab(desc_pm1: jnp.ndarray, n_words: int, iters: int = 8,
                seed: int = 0) -> jnp.ndarray:
    """Binary k-means on +-1 descriptors -> (V,256) int8 codebook.

    Replaces the offline DBoW2 vocabulary build; the reference ships a
    pretrained ORBvoc.txt which `load_vocab_text` can also import.
    Lloyd iterations with sign() binarization of the mean keep centroids
    binary so quantization stays a pure matmul.
    """
    desc = desc_pm1.astype(jnp.float32)
    n = desc.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_words,), replace=n < n_words)
    words = desc[init_idx]

    def step(_, words):
        sim = desc @ words.T  # (n, V), higher = closer
        assign = jnp.argmax(sim, axis=1)
        one_hot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32)  # (n,V)
        sums = one_hot.T @ desc  # (V,256)
        counts = one_hot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, jnp.sign(sums + 0.5), words)
        return new

    words = jax.lax.fori_loop(0, iters, step, words)
    return words.astype(jnp.int8)


def load_vocab_text(path: str, max_words: int | None = None) -> np.ndarray:
    """Import a DBoW2 text vocabulary (ORBvoc.txt format: header `k L s w`,
    then one node per line: parent_id is_leaf d0..d31 weight). Returns the
    leaf descriptors as a (V,256) +-1 int8 codebook (reference
    include/ORBVocabulary.h / TemplatedVocabulary::loadFromTextFile)."""
    words = []
    with open(path) as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            if len(parts) < 34:
                continue
            if parts[1] == "1":  # leaf
                by = np.array([int(b) for b in parts[2:34]], np.uint8)
                bits = np.unpackbits(by)
                words.append(bits.astype(np.int8) * 2 - 1)
                if max_words and len(words) >= max_words:
                    break
    return np.stack(words)


@functools.partial(jax.jit, static_argnames=())
def quantize(desc_pm1: jnp.ndarray, feat_valid: jnp.ndarray,
             words_pm1: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each descriptor to its nearest word; return (word_ids (N,),
    bow (V,) L1-normalized tf vector). One MXU matmul for the whole frame."""
    sim = desc_pm1.astype(jnp.float32) @ words_pm1.astype(jnp.float32).T
    wid = jnp.argmax(sim, axis=1).astype(jnp.int32)
    V = words_pm1.shape[0]
    tf = jnp.zeros(V, jnp.float32).at[wid].add(feat_valid.astype(jnp.float32))
    norm = jnp.maximum(tf.sum(), 1e-9)
    return wid, tf / norm


def l1_score(bow_q: jnp.ndarray, bow_db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score, batched: (V,) query vs (Kmax,V) database -> (Kmax,).
    sum(min(q, w)) per row."""
    return jnp.minimum(bow_q[None, :], bow_db).sum(axis=1)


class KeyFrameDatabase(NamedTuple):
    """Dense inverted index: per-KF tf vectors + word presence masks."""
    bow: jnp.ndarray        # (Kmax, V) float32 L1-normalized tf
    has_word: jnp.ndarray   # (Kmax, V) bool
    valid: jnp.ndarray      # (Kmax,) bool


def empty_database(Kmax: int, V: int) -> KeyFrameDatabase:
    return KeyFrameDatabase(
        bow=jnp.zeros((Kmax, V), jnp.float32),
        has_word=jnp.zeros((Kmax, V), bool),
        valid=jnp.zeros(Kmax, bool),
    )


def add_keyframe(db: KeyFrameDatabase, slot, bow: jnp.ndarray) -> KeyFrameDatabase:
    return KeyFrameDatabase(
        bow=db.bow.at[slot].set(bow),
        has_word=db.has_word.at[slot].set(bow > 0),
        valid=db.valid.at[slot].set(True),
    )


def erase_keyframe(db: KeyFrameDatabase, slot) -> KeyFrameDatabase:
    return KeyFrameDatabase(
        bow=db.bow.at[slot].set(0.0),
        has_word=db.has_word.at[slot].set(False),
        valid=db.valid.at[slot].set(False),
    )


@functools.partial(jax.jit, static_argnames=("top_k",))
def detect_candidates(
    db: KeyFrameDatabase,
    bow_q: jnp.ndarray,
    exclude_mask: jnp.ndarray,
    top_k: int = 3,
    min_common_frac: float = 0.8,
):
    """DetectNBestCandidates semantics (reference src/KeyFrameDatabase.cc:612):
    count common words with each stored KF; gate at min_common_frac * max
    common words; L1-score the survivors; return top_k (scores, indices).

    exclude_mask: (Kmax,) bool — connected/covisible KFs to skip (the
    reference excludes the query's covisibility group).
    """
    common = (db.has_word & (bow_q > 0)[None, :]).sum(axis=1)
    ok = db.valid & ~exclude_mask
    max_common = jnp.max(jnp.where(ok, common, 0))
    gate = ok & (common >= min_common_frac * max_common) & (common > 0)
    scores = jnp.where(gate, l1_score(bow_q, db.bow), -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, top_k)
    return top_scores, top_idx
