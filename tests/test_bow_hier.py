"""Hierarchical (2-level) BoW at real-vocabulary scale: quantization,
sparse per-keyframe tf-idf index, retrieval semantics, lifecycle.

Reference: DBoW2 TemplatedVocabulary (6-level tree, idf weights) +
KeyFrameDatabase inverted index (src/KeyFrameDatabase.cc:612,783); the
TPU-native form is two MXU matmuls per frame + sparse word rows (see
retrieval/bow.py)."""

import numpy as np
import jax.numpy as jnp

from eorb_slam_tpu.retrieval import bow


def _descs(n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, (n, 256)).astype(np.int8) * 2 - 1)


def _noisy(d, flips, seed):
    rng = np.random.default_rng(seed)
    d = np.asarray(d).copy()
    for r in range(len(d)):
        idx = rng.integers(0, 256, flips)
        d[r, idx] *= -1
    return jnp.asarray(d)


def test_sparse_bow_row_aggregates_and_normalizes():
    ids = jnp.asarray([5, 3, 5, -1, 3, 9], jnp.int32)
    w = jnp.asarray([1.0, 2.0, 1.0, 7.0, 2.0, 4.0])
    out_ids, out_w = bow.sparse_bow_row(ids, jnp.where(ids >= 0, w, 0.0))
    oi = np.asarray(out_ids)
    ow = np.asarray(out_w)
    keep = oi >= 0
    assert sorted(oi[keep].tolist()) == [3, 5, 9]
    assert np.isclose(ow[keep].sum(), 1.0)
    # word 3 carries 4/12, word 5 2/12, word 9 4/12 of the L1 mass
    m = dict(zip(oi[keep].tolist(), ow[keep].tolist()))
    assert np.isclose(m[3], 4 / 10) and np.isclose(m[5], 2 / 10)


def test_hier_quantize_deterministic_and_in_range():
    train = _descs(512, 0)
    voc = bow.train_hier_vocab(train, K1=8, K2=8, iters=3)
    wid, w = bow.quantize_hier(train[:64], jnp.ones(64, bool), voc)
    wid = np.asarray(wid)
    assert (wid >= 0).all() and (wid < voc.V).all()
    wid2, _ = bow.quantize_hier(train[:64], jnp.ones(64, bool), voc)
    assert (wid == np.asarray(wid2)).all()
    # invalid features get -1
    wid3, _ = bow.quantize_hier(train[:64], jnp.zeros(64, bool), voc)
    assert (np.asarray(wid3) == -1).all()


def test_sparse_retrieval_prefers_revisit():
    """A frame re-observing KF 2's descriptors (with bit noise) must
    retrieve KF 2 over unrelated keyframes."""
    rng = np.random.default_rng(1)
    frames = [_descs(128, 10 + k) for k in range(6)]
    voc = bow.train_hier_vocab(jnp.concatenate(frames), K1=8, K2=16, iters=3)
    db = bow.empty_sparse_database(8, 128)
    for k, d in enumerate(frames):
        wid, w = bow.quantize_hier(d, jnp.ones(128, bool), voc)
        db = bow.sparse_add_keyframe(db, k, wid, w)
    q = _noisy(frames[2], flips=8, seed=99)
    wid, w = bow.quantize_hier(q, jnp.ones(128, bool), voc)
    qi, qw = bow.sparse_bow_row(wid, w)
    scores, idx = bow.sparse_detect_candidates(
        db, qi, qw, jnp.zeros(8, bool), top_k=3)
    assert int(np.asarray(idx)[0]) == 2
    # self-exclusion works
    excl = jnp.zeros(8, bool).at[2].set(True)
    _, idx2 = bow.sparse_detect_candidates(db, qi, qw, excl, top_k=3)
    assert int(np.asarray(idx2)[0]) != 2


def test_sparse_erase_removes_candidate():
    frames = [_descs(96, 30 + k) for k in range(4)]
    voc = bow.train_hier_vocab(jnp.concatenate(frames), K1=8, K2=8, iters=3)
    db = bow.empty_sparse_database(8, 96)
    for k, d in enumerate(frames):
        wid, w = bow.quantize_hier(d, jnp.ones(96, bool), voc)
        db = bow.sparse_add_keyframe(db, k, wid, w)
    db = bow.sparse_erase_keyframe(db, 1)
    q = _noisy(frames[1], flips=6, seed=7)
    wid, w = bow.quantize_hier(q, jnp.ones(96, bool), voc)
    qi, qw = bow.sparse_bow_row(wid, w)
    scores, idx = bow.sparse_detect_candidates(
        db, qi, qw, jnp.zeros(8, bool), top_k=2)
    assert int(np.asarray(idx)[0]) != 1


def test_large_vocab_memory_shape():
    """Real-vocabulary scale: V > 1e5 words stays compact (int8 codebooks,
    sparse rows) — no dense (Kmax,V) structures anywhere."""
    voc = bow.HierVocab(
        words1=jnp.zeros((256, 256), jnp.int8),
        words2=jnp.zeros((256, 512, 256), jnp.int8),
        weights=jnp.ones(256 * 512, jnp.float32),
    )
    assert voc.V == 131072
    db = bow.empty_sparse_database(64, 512)
    bytes_db = sum(np.asarray(x).nbytes for x in db)
    bytes_voc = sum(np.asarray(x).nbytes for x in voc)
    assert bytes_voc < 50e6 and bytes_db < 2e6


def test_loopcloser_with_hier_vocab_smoke():
    """MonoSlam wired with a HierVocab runs the sparse retrieval path end
    to end (add/query/erase through the LoopCloser dispatch)."""
    from eorb_slam_tpu.slam.system import MonoSlam
    from tests.synth import CAM, SynthWorld

    world = SynthWorld(n_landmarks=1200, seed=4)
    train = _descs(2048, 5)
    voc = bow.train_hier_vocab(train, K1=8, K2=16, iters=3)
    slam = MonoSlam(CAM, K=16, M=2048, N=512, loop_words=voc,
                    loop_min_gap=4)
    for i in range(60):
        f, _ = world.frame(i / 20.0)
        slam.process_features(f)
    assert slam.stats["kf"] >= 4
    assert slam.loops_closed == 0  # consistent forward path: no false loop
    assert bool(np.asarray(slam.loop_closer.db.valid).sum()) 
