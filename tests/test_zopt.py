"""Z-optimization engine tests: convergence, frozen-mask invariance,
min-loss retention, patch extraction, histogram properties."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.zopt.optimizer import ZOptimizer, atanh_init
from exsr.zopt import objectives as obj
from exsr.zopt.patches import patch_indices_from_mask, masked_patch_std
from exsr.zopt.histogram import SoftHistogramLoss


def linear_forward(w):
    """Toy 'generator': out = sigmoid-ish affine map of z (keeps out in
    [0,1] so objectives behave like on images)."""
    def fwd(z):
        return jax.nn.sigmoid(w * z)
    return fwd


def test_l1_objective_convergence():
    desired = 0.8 * jnp.ones((1, 8, 8, 3))
    fwd = linear_forward(3.0)
    loss = obj.l1_to_desired(desired, None)
    zo = ZOptimizer(fwd, loss, lr=0.1)
    theta0 = jnp.zeros((1, 8, 8, 3))
    z, theta, state, losses = zo.optimize(theta0, max_iters=100)
    assert losses[-1] < 0.3 * losses[0]
    out = fwd(z)
    assert abs(float(out.mean()) - 0.8) < 0.1


def test_frozen_mask_keeps_region():
    desired = jnp.ones((1, 8, 8, 3))
    fwd = linear_forward(2.0)
    loss = obj.l1_to_desired(desired, None)
    zo = ZOptimizer(fwd, loss, lr=0.2)
    theta0 = jnp.zeros((1, 8, 8, 3))
    z_mask = jnp.zeros((1, 8, 8, 3)).at[:, :4].set(1.0)
    z, theta, _, _ = zo.optimize(theta0, max_iters=20, z_mask=z_mask,
                                 frozen_theta=theta0)
    # frozen half must stay at tanh(0) == 0
    np.testing.assert_allclose(np.asarray(z[:, 4:]), 0.0, atol=1e-7)
    assert float(jnp.abs(z[:, :4]).mean()) > 0.1


def test_min_loss_z_retention():
    # quadratic with minimum away from the end of a deliberately unstable
    # trajectory: best-Z must beat last-Z
    fwd = lambda z: z

    def loss_fn(out, z):
        return ((out - 0.5) ** 2).sum()

    zo = ZOptimizer(fwd, loss_fn, lr=0.9)  # big LR: oscillates
    theta0 = jnp.zeros((1, 2, 2, 1))
    z, theta, _, losses = zo.optimize(theta0, max_iters=30)
    final_loss = float(loss_fn(fwd(z), z))
    assert final_loss <= min(losses) + 1e-6


def test_plateau_mode_stops_early():
    desired = 0.5 * jnp.ones((1, 4, 4, 3))
    fwd = linear_forward(1.0)
    loss = obj.l1_to_desired(desired, None)
    zo = ZOptimizer(fwd, loss, lr=0.5)
    z, theta, _, losses = zo.optimize(jnp.zeros((1, 4, 4, 3)),
                                      max_iters=-10)
    assert 10 <= len(losses) <= 50


def test_patch_indices_cover_mask():
    mask = np.zeros((32, 32), bool)
    mask[4:24, 6:29] = True
    idx = patch_indices_from_mask(mask, 7, patches_overlap=1.0)
    assert idx.shape[1] == 49
    rows, cols = np.unravel_index(idx.reshape(-1), mask.shape)
    assert mask[rows, cols].all()
    # overlap control reduces patch count
    idx_sparse, non_cov = patch_indices_from_mask(
        mask, 7, patches_overlap=0.5, return_non_covered=True)
    assert 0 < len(idx_sparse) < len(idx)


def test_masked_patch_std():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
    mask = np.zeros((32, 32), bool)
    mask[:16, :16] = True
    idx = patch_indices_from_mask(mask, 7)
    stds = masked_patch_std(img, jnp.asarray(idx))
    assert stds.shape[0] == len(idx)
    # uniform noise STD ~ sqrt(1/12) ~ 0.29
    assert 0.15 < float(stds.mean()) < 0.4


def test_std_objective_increases_std():
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.uniform(0.4, 0.6, size=(1, 16, 16, 3))
                       .astype(np.float32))

    def fwd(z):
        return base + 0.3 * jnp.tanh(z)

    helpers = obj.STDHelpers.create(np.ones((16, 16), np.float32),
                                    local=False)
    loss = obj.std_objective(helpers, 'max_STD')
    zo = ZOptimizer(fwd, loss, lr=0.1)
    z, *_ = zo.optimize(jnp.zeros((1, 16, 16, 3)), max_iters=40)
    std0 = float(helpers(base)[0, 0])
    std1 = float(helpers(fwd(z))[0, 0])
    assert std1 > std0 * 1.5


def test_diversity_objective_separates_batch():
    base = 0.5 * jnp.ones((3, 8, 8, 3))

    def fwd(z):
        return base + 0.2 * jnp.tanh(z)

    loss = obj.diversity_objective('random_l1', None)
    zo = ZOptimizer(fwd, loss, lr=0.2)
    key = jax.random.PRNGKey(0)
    theta0 = 0.01 * jax.random.normal(key, (3, 8, 8, 3))
    z, *_ = zo.optimize(theta0, max_iters=30)
    outs = fwd(z)
    pair01 = float(jnp.abs(outs[0] - outs[1]).mean())
    assert pair01 > 0.05


def test_histogram_loss_zero_for_matching_image():
    rng = np.random.default_rng(2)
    im = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    mask = np.ones((24, 24), np.float32)
    shl = SoftHistogramLoss.create([im], [mask], mask, temperature=5e-4)
    same = jnp.asarray(im)[None]
    other = jnp.asarray(rng.uniform(size=(24, 24, 3))
                        .astype(np.float32))[None] * 0.3
    l_same = float(shl(same))
    l_other = float(shl(other))
    assert l_same < l_other


def test_histogram_patch_dictionary():
    rng = np.random.default_rng(3)
    im = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    mask = np.ones((24, 24), np.float32)
    shl = SoftHistogramLoss.create([im], [mask], mask, patch_size=6,
                                   temperature=1e-3,
                                   dictionary_not_histogram=True)
    l_same = float(shl(jnp.asarray(im)[None]))
    l_shift = float(shl(jnp.asarray(np.clip(im + 0.4, 0, 1))[None]))
    assert l_same < l_shift


def test_atanh_init_round_trip():
    z = jnp.asarray([[0.3, -0.7, 0.0]])
    theta = atanh_init(z, 1.0)
    np.testing.assert_allclose(np.asarray(jnp.tanh(theta)),
                               np.asarray(z), atol=1e-6)


def test_auto_temperature_maximizes_gradient_norm():
    """The gradient-searched temperature should attain a dKL/dtheta norm at
    least as large as the 0.05 starting temperature's (the argmax-tracking
    guarantees this by construction — Z_optimization.py:535-536)."""
    import jax
    from exsr.zopt.histogram import kl_div

    rng = np.random.default_rng(4)
    im = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    mask = np.ones((16, 16), np.float32)
    shl = SoftHistogramLoss.create([im], [mask], mask, temperature=0.05)
    theta0 = jnp.asarray(rng.normal(size=(1, 16, 16, 3))
                         .astype(np.float32)) * 0.1

    def image_of_theta(th):
        return jnp.tanh(th) * 0.5 + 0.5

    t_auto = shl.auto_temperature(image_of_theta, theta0, n_iters=20)
    assert np.isfinite(t_auto) and t_auto > 0

    def gnorm(t):
        dh, norm = shl.hist.histogram(shl.desired_vals, temperature=t)

        def kl_of(th):
            vals = shl._image_values(image_of_theta(th)[0])
            h, _ = shl.hist.histogram(vals, norm, temperature=t)
            return kl_div(jnp.log(h + 1e-12), dh)

        return float(jnp.linalg.norm(jax.grad(kl_of)(theta0)))

    assert gnorm(t_auto) >= gnorm(0.05) * (1 - 1e-5)


def test_calibrate_temperature_recomputes_desired_hist():
    rng = np.random.default_rng(5)
    im = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    mask = np.ones((16, 16), np.float32)
    shl = SoftHistogramLoss.create([im], [mask], mask, temperature=0.05)
    other = jnp.asarray(rng.uniform(size=(16, 16, 3))
                        .astype(np.float32))
    t = shl.calibrate_temperature(other, desired_kl=1.0)
    assert np.isfinite(t) and t > 0


def test_optimize_rounds_compiled_loop():
    """The in-scan round loop (accept/revert + LR/lr_decay + early freeze)
    matches the GUI semantics (GUI.py:2043-2134) on a toy objective."""
    import jax.numpy as jnp
    from exsr.zopt.optimizer import ZOptimizer

    target = jnp.asarray([[0.3, -0.2]])
    zo = ZOptimizer(forward_fn=lambda z: z,
                    objective_fn=lambda out, z: ((out - target) ** 2).sum(),
                    lr=0.3, z_range=1.0)
    theta0 = jnp.zeros((1, 2))
    z, theta, best_loss, final_lr, losses = zo.optimize_rounds(
        theta0, n_rounds=12, iters_per_round=5)
    real = losses[~np.isnan(losses)]
    assert real[-1] <= real[0]
    assert best_loss < 1e-3
    np.testing.assert_allclose(np.asarray(z), np.asarray(target), atol=0.05)
    # LR decays only on plateau rounds, never below the floor semantics
    assert final_lr <= 0.3 + 1e-9


def test_digit_views_transform_geometry():
    """Views resize the mask crop to the 54x54 classifier input, replicate
    the single Y channel to 3, and normalize to [-1, 1]
    (Z_optimization.py:551-601 geometry)."""
    t = obj.digit_views_transform((10, 10, 41, 41), (1, 3))
    v = np.asarray(t(jnp.zeros((1, 64, 64, 1), jnp.float32)))
    assert v.shape[1:] == (54, 54, 3)
    assert v.shape[0] >= 3            # zoom x translation views
    assert np.allclose(v, -1.0)       # zeros -> normalized -1


def test_digit_score_reads_classifier_heads():
    """digit_score returns (argmax length head, mean prob of the target
    digit) — Z_optimization.py:782-786 semantics."""
    t = obj.digit_views_transform((0, 0, 31, 31), (0, 1))

    def clf(x):
        n = x.shape[0]
        length = jnp.zeros((n, 7)).at[:, 1].set(10.0)   # "one digit"
        d1 = jnp.zeros((n, 10)).at[:, 7].set(10.0)      # "it's a 7"
        return length, d1
    num, prob = obj.digit_score(clf, t, jnp.zeros((1, 32, 32, 1)), 7)
    assert num == 1 and prob > 0.99
    _, prob3 = obj.digit_score(clf, t, jnp.zeros((1, 32, 32, 1)), 3)
    assert prob3 < 0.01


def test_digit_objective_traced_matches_static():
    """The traced-label variant computes the same loss as the static
    digit_objective for every label (one compile serves all 10)."""
    bounds = (0, 0, 31, 31)
    t = obj.digit_views_transform(bounds, (1, 3))

    def clf(x):
        s = x.mean(axis=(1, 2, 3))
        return (s[:, None] + jnp.arange(7.0),
                s[:, None] * jnp.arange(10.0))
    out = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 32, 32, 1)).astype(np.float32))
    traced = obj.digit_objective_traced(clf, t)
    for d in (0, 4, 9):
        static = obj.digit_objective(clf, bounds, d, multiview=(1, 3))
        lt = float(traced(out, None, {'digit': jnp.asarray(d, jnp.int32)}))
        ls = float(static(out, None))
        assert np.isclose(lt, ls, rtol=1e-6)


def test_scribble_mask_components_shared_helper():
    """Brightness smear + class masks (Z_optimization.py:409-423): L1
    covers stroke classes 1-3, each TV id >3 gets its own mask, and the
    3x3-smoothed multiplier peaks at 1+b inside class-2 strokes."""
    from exsr.utils.misc import scribble_mask_components
    sm = np.zeros((16, 16), np.int32)
    sm[2:5, 2:5] = 1          # color stroke
    sm[7:10, 2:5] = 2         # brighten
    sm[12:15, 2:5] = 5        # TV region id
    mask = np.ones((16, 16), np.float32)
    mult, l1, tvs = scribble_mask_components(sm, mask, 0.3)
    assert l1[3, 3] == 1 and l1[8, 3] == 1 and l1[13, 3] == 0
    assert len(tvs) == 1 and tvs[0][13, 3] == 1 and tvs[0][3, 3] == 0
    assert np.isclose(mult[8, 3], 1.3)          # stroke interior
    assert np.isclose(mult[3, 3], 1.0)          # class 1: no scaling
    # region mask gates everything
    _, l1g, tvg = scribble_mask_components(sm, np.zeros_like(mask), 0.3)
    assert l1g.sum() == 0 and len(tvg) == 0
