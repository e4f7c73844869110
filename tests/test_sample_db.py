"""Sample database: ring semantics, background densities, reservoir."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from gmmvi_tpu.models import gmm as G
from gmmvi_tpu.optimization import sample_db as DB


def _model(k=2, d=2, kmax=3, seed=0):
    rng = np.random.RandomState(seed)
    w = np.ones(k, np.float32) / k
    mu = rng.randn(k, d).astype(np.float32)
    covs = np.tile((0.5 * np.eye(d, dtype=np.float32))[None], (k, 1, 1))
    return G.create_gmm_state(w, mu, covs, max_components=kmax)


def _add_batch(db, model, iteration, n_per_comp, seed, valid_pattern=None):
    rng = np.random.RandomState(seed)
    kmax = model.max_components
    b = kmax * n_per_comp
    samples = rng.randn(b, db.num_dimensions).astype(np.float32)
    mapping = np.repeat(np.arange(kmax), n_per_comp).astype(np.int32)
    valid = np.zeros(b, bool)
    k = int(model.num_active)
    valid[mapping < k] = True
    if valid_pattern is not None:
        valid = valid_pattern
    lnpdfs = rng.randn(b).astype(np.float32)
    grads = rng.randn(b, db.num_dimensions).astype(np.float32)
    db = DB.add_samples(
        db, jnp.asarray(iteration), model, jnp.asarray(samples),
        jnp.asarray(valid), jnp.asarray(mapping), jnp.asarray(lnpdfs),
        jnp.asarray(grads), jax.random.PRNGKey(seed),
    )
    return db, samples[valid], lnpdfs[valid], mapping[valid]


def test_add_and_get_newest_roundtrip():
    model = _model()
    db = DB.create_sample_db(dim=2, max_components=3, capacity=32,
                             dist_ring_iters=4, reservoir_capacity=16)
    db, s0, l0, m0 = _add_batch(db, model, 0, 4, seed=1)
    assert int(db.write_pos) == 8  # 2 active comps * 4
    assert int(db.num_samples_written) == 8

    win = DB.get_newest_samples(db, 16, jnp.asarray(8), 3)
    v = np.asarray(win.valid)
    assert v.sum() == 8
    got = np.asarray(win.samples)[v]
    # window is oldest-first; all 8 valid samples present
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(s0, axis=0),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.asarray(win.target_lnpdfs)[v]), np.sort(l0), rtol=1e-6
    )


def test_newest_window_requests_subset():
    model = _model()
    db = DB.create_sample_db(2, 3, 64, 4, 16)
    db, s0, _, _ = _add_batch(db, model, 0, 4, seed=2)
    db, s1, _, _ = _add_batch(db, model, 1, 4, seed=3)
    # request only the newest 8 (= second batch)
    win = DB.get_newest_samples(db, 32, jnp.asarray(8), 3)
    v = np.asarray(win.valid)
    assert v.sum() == 8
    np.testing.assert_allclose(
        np.sort(np.asarray(win.samples)[v], axis=0), np.sort(s1, axis=0),
        rtol=1e-6,
    )


def test_background_densities_match_bruteforce():
    """Background = count-weighted mixture over the distinct generating
    Gaussians in the window (reference: sample_db.py:164-228)."""
    model = _model(seed=4)
    db = DB.create_sample_db(2, 3, 64, 4, 16)
    db, _, _, _ = _add_batch(db, model, 0, 4, seed=5)
    win = DB.get_newest_samples(db, 16, jnp.asarray(8), 6)
    v = np.asarray(win.valid)
    samples = np.asarray(win.samples)[v]
    mapping = np.asarray(win.mapping)[v]
    bg = np.asarray(win.background_log_pdfs)[v]

    counts = np.bincount(mapping, minlength=3).astype(np.float64)
    weights = counts / counts.sum()
    dens = np.zeros(len(samples))
    for kk in range(2):
        mu = np.asarray(model.means[kk])
        cov = np.asarray(model.covs[kk])
        dens += weights[kk] * stats.multivariate_normal.pdf(samples, mu, cov)
    np.testing.assert_allclose(bg, np.log(dens), rtol=1e-4, atol=1e-4)


def test_background_spans_multiple_snapshots():
    """Samples from different iterations use that iteration's component
    parameters for the background mixture."""
    model0 = _model(seed=6)
    db = DB.create_sample_db(2, 3, 64, 4, 8)
    db, s0, _, m0 = _add_batch(db, model0, 0, 3, seed=7)

    # move the components, add more samples
    model1 = G.replace_components(
        model0,
        model0.means + 3.0,
        model0.chols * 1.5,
    )
    db, s1, _, m1 = _add_batch(db, model1, 1, 3, seed=8)

    win = DB.get_newest_samples(db, 32, jnp.asarray(12), 8)
    v = np.asarray(win.valid)
    assert v.sum() == 12
    samples = np.asarray(win.samples)[v]
    bg = np.asarray(win.background_log_pdfs)[v]

    # brute force: 4 distinct dists (2 comps x 2 snapshots), 3 samples each
    mus = [np.asarray(model0.means[k]) for k in range(2)] + \
          [np.asarray(model1.means[k]) for k in range(2)]
    covs = [np.asarray(model0.covs[k]) for k in range(2)] + \
           [np.asarray(model1.covs[k]) for k in range(2)]
    dens = np.zeros(len(samples))
    for mu, cov in zip(mus, covs):
        dens += 0.25 * stats.multivariate_normal.pdf(samples, mu, cov)
    np.testing.assert_allclose(bg, np.log(dens), rtol=1e-4, atol=1e-4)


def test_ring_overwrites_oldest():
    model = _model()
    db = DB.create_sample_db(2, 3, 16, 8, 8)  # capacity 16
    for it in range(4):  # 4 * 8 = 32 valid samples through a 16-slot ring
        db, _, _, _ = _add_batch(db, model, it, 4, seed=10 + it)
    assert int(db.write_pos) == 32
    win = DB.get_newest_samples(db, 16, jnp.asarray(16), 8)
    assert int(win.num_valid) == 16  # only the ring capacity is retrievable


def test_stale_dist_invalidates_samples():
    """When a sample's generating snapshot ages out of the dist ring, the
    sample drops out of the reuse window."""
    model = _model()
    db = DB.create_sample_db(2, 3, 128, 2, 8)  # only 2 snapshot rows
    for it in range(4):
        db, _, _, _ = _add_batch(db, model, it, 4, seed=20 + it)
    win = DB.get_newest_samples(db, 64, jnp.asarray(32), 8)
    # only iterations 2,3 still have live snapshots -> 16 valid
    assert int(win.num_valid) == 16


def test_reservoir_uniformity():
    model = _model()
    db = DB.create_sample_db(2, 3, 64, 4, reservoir_capacity=64)
    all_lnpdfs = []
    for it in range(40):
        db, _, l, _ = _add_batch(db, model, it, 4, seed=100 + it)
        all_lnpdfs.append(l)
    assert int(db.res_count) == 40 * 8
    s, l, valid = DB.get_random_samples(db, jax.random.PRNGKey(0), 32)
    assert np.asarray(valid).all()
    # reservoir entries must come from the true history
    hist = np.concatenate(all_lnpdfs)
    assert np.isin(np.asarray(db.res_lnpdfs), hist).all()
    # and should span early and late history (uniform-ish)
    res = np.asarray(db.res_lnpdfs)
    early = np.isin(res, np.concatenate(all_lnpdfs[:20])).mean()
    assert 0.2 < early < 0.8


def test_feval_counter_counts_only_valid():
    model = _model()
    db = DB.create_sample_db(2, 3, 64, 4, 8)
    b = 3 * 4
    pattern = np.zeros(b, bool)
    pattern[:5] = True
    db, _, _, _ = _add_batch(db, model, 0, 4, seed=30, valid_pattern=pattern)
    assert int(db.num_samples_written) == 5


def test_random_samples_keep_samples_false_uses_newest_batch_only():
    """With use_sample_database: false the reference's DB holds only the last
    batch (sample_db.py:126-135), so add-heuristic candidates must come from
    the newest batch — not the whole-history reservoir."""
    import jax
    import jax.numpy as jnp
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db as db_ops

    rng = np.random.RandomState(0)
    d, kmax = 2, 2
    model = G.create_gmm_state(
        np.full(kmax, 0.5, np.float32), rng.randn(kmax, d).astype(np.float32),
        np.tile(np.eye(d, dtype=np.float32)[None], (kmax, 1, 1)),
        max_components=kmax, diagonal=False,
    )
    db = db_ops.create_sample_db(
        dim=d, max_components=kmax, capacity=64, dist_ring_iters=4,
        reservoir_capacity=64, diagonal=False, keep_samples=False,
    )
    key = jax.random.PRNGKey(0)
    for it in range(3):
        b = 10
        # batch `it` has all-coordinate value == it (easy provenance check)
        samples = jnp.full((b, d), float(it))
        key, k = jax.random.split(key)
        db = db_ops.add_samples(
            db, jnp.asarray(it), model, samples, jnp.ones(b, bool),
            jnp.zeros(b, jnp.int32), jnp.full((b,), float(it)),
            jnp.zeros((b, d)), k,
        )
    s, lnp, valid = db_ops.get_random_samples(db, jax.random.PRNGKey(9), 16)
    v = np.asarray(valid)
    assert v.sum() == 10  # only the newest batch qualifies
    np.testing.assert_allclose(np.asarray(s)[v], 2.0)
    np.testing.assert_allclose(np.asarray(lnp)[v], 2.0)


def _dec_add(db, model, value, n, it):
    import jax
    import jax.numpy as jnp
    from gmmvi_tpu.optimization import sample_db_decimate as DEC

    d = db.num_dimensions
    return DEC.add_samples(
        db, jnp.asarray(it), model, jnp.full((n, d), float(value)),
        jnp.ones(n, bool), jnp.zeros(n, jnp.int32),
        jnp.full((n,), float(value)), jnp.zeros((n, d)),
        jax.random.PRNGKey(it),
    )


def test_decimating_db_never_exceeds_capacity():
    """Regression: when one halving cannot make room (capacity 20, batch 16)
    the DB must decimate by a larger stride instead of silently dropping the
    overflow rows while still counting them (count > capacity corrupted
    every subsequent window query)."""
    import jax.numpy as jnp
    import numpy as np
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db_decimate as DEC

    rng = np.random.RandomState(0)
    d, kmax = 2, 2
    model = G.create_gmm_state(
        np.full(kmax, 0.5, np.float32), rng.randn(kmax, d).astype(np.float32),
        np.tile(np.eye(d, dtype=np.float32)[None], (kmax, 1, 1)),
        max_components=kmax, diagonal=False,
    )
    db = DEC.create_decimating_db(d, kmax, capacity=20, dist_capacity=64)
    for it in range(4):
        db = _dec_add(db, model, value=it, n=16, it=it)
        assert int(db.count) <= db.capacity
    # newest batch must be fully present and uncorrupted
    cnt = int(db.count)
    stored = np.asarray(db.samples[:cnt, 0])
    assert (stored == 3.0).sum() == 16
    # survivors of older batches are real stored rows, not duplicated junk
    assert set(np.unique(stored)).issubset({0.0, 1.0, 2.0, 3.0})
    assert int(db.num_samples_written) == 64


def test_decimating_db_keep_samples_false_replaces_store():
    """tpu.db_eviction: decimate + use_sample_database: false — each add
    replaces the store (reference sample_db.py:126-135), so random-sample
    candidates come from the newest batch only."""
    import jax
    import numpy as np
    from gmmvi_tpu.models import gmm as G
    from gmmvi_tpu.optimization import sample_db_decimate as DEC

    rng = np.random.RandomState(0)
    d, kmax = 2, 2
    model = G.create_gmm_state(
        np.full(kmax, 0.5, np.float32), rng.randn(kmax, d).astype(np.float32),
        np.tile(np.eye(d, dtype=np.float32)[None], (kmax, 1, 1)),
        max_components=kmax, diagonal=False,
    )
    db = DEC.create_decimating_db(d, kmax, capacity=64, dist_capacity=64,
                                  keep_samples=False)
    for it in range(3):
        db = _dec_add(db, model, value=it, n=10, it=it)
    assert int(db.count) == 10
    s, lnp, valid = DEC.get_random_samples(db, jax.random.PRNGKey(9), 16)
    v = np.asarray(valid)
    assert v.sum() == 10
    np.testing.assert_allclose(np.asarray(s)[v], 2.0)
    assert int(db.num_samples_written) == 30  # feval counter still cumulative
