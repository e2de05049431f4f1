"""Training-layer tests on a tiny model over the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exsr.cem.cem import CEM, CEMConf, cem_wrap
from exsr.models.rrdb import RRDBNet
from exsr.models.discriminators import DiscriminatorVGG128
from exsr.parallel.mesh import make_mesh, ShardingRules
from exsr.train.srragan import (SRRaGANTrainer, TrainConfig, flax_d_adapter,
                                multistep_lr)
from exsr.train.controller import GANController, GDUpdateController


@pytest.fixture(scope='module')
def tiny_setup():
    cem = CEM.create(CEMConf(scale_factor=4))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=1, nf=16, gc=8, latent_channels=3)
    patch = 4 * (2 * cem.invalidity_margins_lr + 8)  # HR patch size
    lr_size = patch // 4
    d_input = patch - 2 * cem.invalidity_margins_hr
    d = DiscriminatorVGG128(base_nf=8, nb=4, num_2_strides=1,
                            input_patch_size=d_input)
    g_params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, lr_size, lr_size,
                                                        3)),
                      jnp.zeros((1, patch, patch, 3)))
    d_vars = d.init(jax.random.PRNGKey(1), jnp.zeros((1, d_input, d_input,
                                                      3)))
    wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=4)
    g_apply = lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False)
    cfg = TrainConfig(optimal_z_iters=2, steps_4_loss_std=5)
    trainer = SRRaGANTrainer(cfg, g_apply, flax_d_adapter(d),
                             margins_hr=cem.invalidity_margins_hr)
    return cem, trainer, g_params, dict(d_vars), lr_size, patch


def _batch(lr_size, patch, b=8, seed=0):
    rng = np.random.default_rng(seed)
    return {'lr': jnp.asarray(rng.uniform(size=(b, lr_size, lr_size, 3))
                              .astype(np.float32)),
            'hr': jnp.asarray(rng.uniform(size=(b, patch, patch, 3))
                              .astype(np.float32))}


@pytest.mark.slow
def test_d_and_g_steps_update_params(tiny_setup):
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(2))
    batch = _batch(lr_size, patch)
    state1, d_metrics = trainer.d_step(state, batch, dual=False)
    assert np.isfinite(float(d_metrics['l_d_total']))
    # D params changed
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.d_vars['params'], state1.d_vars['params'])
    assert max(jax.tree.leaves(delta)) > 0
    state2, g_metrics = trainer.g_step(state1, batch, dual=False,
                                       use_gan=True)
    for k in ('l_g_range', 'l_g_latent', 'l_g_gan', 'l_g_total'):
        assert np.isfinite(float(g_metrics[k])), k
    delta_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state1.g_params, state2.g_params)
    assert max(jax.tree.leaves(delta_g)) > 0
    # ratio stats advanced by one batch of measurements
    assert int(state2.ratio_stats.count) == batch['hr'].shape[0]


@pytest.mark.slow
def test_dual_step_map_loss(tiny_setup):
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(3))
    batch = _batch(lr_size, patch, seed=1)
    state1, m = trainer.g_step(state, batch, dual=True, use_gan=False)
    assert 'l_g_optimalZ' in m and np.isfinite(float(m['l_g_optimalZ']))


def test_multistep_lr():
    lr = multistep_lr(1e-5, (10, 20), 0.5, jnp.asarray(0))
    assert float(lr) == pytest.approx(1e-5)
    lr = multistep_lr(1e-5, (10, 20), 0.5, jnp.asarray(15))
    assert float(lr) == pytest.approx(0.5e-5)
    lr = multistep_lr(1e-5, (10, 20), 0.5, jnp.asarray(25))
    assert float(lr) == pytest.approx(0.25e-5)


def test_controller_gating():
    c = GANController(d_update_ratio=2, d_valid_steps_4_g=3,
                      d_init_iters=0)
    # no history yet: G blocked by 'past' verification, D runs
    assert c.want_d_step()
    assert not c.want_g_step()
    for _ in range(3):
        c.record_d({'D_logits_diff': 1.0, 'Correctly_distinguished': 1.0,
                    'l_d_real_0': 0.1, 'l_d_fake_0': 0.1})
        c.tick()
    # history is all-confident: G allowed on even steps (ratio 2)
    c.step = 4
    assert c.want_g_step()
    c.step = 5
    assert not c.want_g_step()
    # bad D record blocks G again
    c.record_d({'D_logits_diff': -1.0, 'Correctly_distinguished': 0.0,
                'l_d_real_0': 0.1, 'l_d_fake_0': 0.1})
    c.step = 6
    assert not c.want_g_step()


def test_controller_lr_drop():
    c = GANController(steps_4_loss_std=4, std_4_lr_drop=0.01)
    for i in range(8):
        c.record_d({'D_logits_diff': 1.0, 'Correctly_distinguished': 1.0,
                    'l_d_real_0': (i % 2) * 10.0, 'l_d_fake_0': 0.0})
    rollback, too_low = c.check_lr_drop()
    assert rollback and not too_low
    assert c.lr_scale == pytest.approx(0.5)


def test_controller_critic_collapse_guard():
    """check_critic_collapse (exsr extension): fires on the symmetric
    critic collapse observed LIVE on the r4 50k-class run (a 10x lr_D
    jump: D_logits_diff pinned ~0 while |l_d| inflated 0.6 -> 2.5 and
    check_lr_drop's monitored std stayed ~0.005 vs its 1.6 threshold —
    see artifacts/run50k_r4 and scripts_dev/run50k2.sh), and stays quiet
    in the run's two healthy regimes."""
    rng = np.random.default_rng(0)

    def feed(c, n, diff, mag, mag_end=None):
        mag_end = mag if mag_end is None else mag_end
        for i in range(n):
            d = diff + rng.normal(0, 0.003)
            base = mag + (mag_end - mag) * i / max(n - 1, 1)
            m = base * (1 + rng.normal(0, 0.2))
            c.record_d({'D_logits_diff': d, 'Correctly_distinguished': 0.5,
                        'l_d_real_0': m, 'l_d_fake_0': -m})

    # (1) collapse regime (the run's step 40k-42k statistics: diff pinned
    # ~0 while the magnitude INFLATES 0.39 -> 1.2 across the window): fires
    c = GANController()
    feed(c, 250, diff=0.002, mag=0.4, mag_end=1.3)
    assert c.check_critic_collapse()
    # (1b) post-runaway PLATEAU (inflation locally flat but the level is
    # pathological — mags ~1.2 with no separation): fires via mag_hi
    c = GANController()
    feed(c, 250, diff=0.002, mag=1.2)
    assert c.check_critic_collapse()
    # (2) young healthy critic: diff ~0 but magnitudes small — quiet
    c = GANController()
    feed(c, 250, diff=0.01, mag=0.15)
    assert not c.check_critic_collapse()
    # (2b) young wgan critic at MODERATE mags being pulled DOWN by the
    # gradient penalty (the r5 flagship run's first 1000 GAN steps: diff
    # ~0.01, mags 0.6 -> 0.2): the inflation predicate keeps it quiet —
    # magnitude level alone would false-positive here
    c = GANController()
    feed(c, 250, diff=0.008, mag=0.65, mag_end=0.2)
    assert not c.check_critic_collapse()
    # (2c) flat moderate mags with no separation (the probe_lrd tail:
    # diff ~0.005, mag ~0.5 flat): not running away — quiet
    c = GANController()
    feed(c, 250, diff=0.005, mag=0.5)
    assert not c.check_critic_collapse()
    # (3) separated critic (post-gate: diff 0.4-2.5, any magnitude): quiet
    c = GANController()
    feed(c, 250, diff=0.8, mag=1.5)
    assert not c.check_critic_collapse()
    # (4) too little history: quiet
    c = GANController()
    feed(c, 50, diff=0.002, mag=0.4, mag_end=1.3)
    assert not c.check_critic_collapse()
    # and the mode it complements DOESN'T fire on the collapse data —
    # the real/fake mean cancels, reproducing the live blindness
    c = GANController(steps_4_loss_std=100, std_4_lr_drop=1.6)
    feed(c, 250, diff=0.002, mag=0.4, mag_end=1.3)
    rollback, _ = c.check_lr_drop()
    assert not rollback


def test_collapse_guard_default_on_for_wgan():
    """The CLI arms the collapse guard by default exactly for wgan-family
    losses (VERDICT-r4 #4 'default it on for wgan-gp configs'): the
    detector's magnitude thresholds are calibrated on wgan critic scales;
    a vanilla sigmoid GAN logs ~0.69 at chance inside the firing region.
    --collapse_guard / --no-collapse_guard still override both ways."""
    from exsr.apps.train_sr import default_collapse_guard
    assert default_collapse_guard('wgan-gp')
    assert default_collapse_guard('wgan')
    assert not default_collapse_guard('gan')
    assert not default_collapse_guard('ragan')
    assert not default_collapse_guard(None)
    assert not default_collapse_guard('')


def test_collapse_guard_replays_recorded_r4_divergence():
    """Replay the ACTUAL recorded series of the r4 50k-class run
    (experiments/run50k2/logs.npz, committed excerpt below) through the
    guard: the divergence window (39200-42800, 100-step samples) fires,
    the healthy pre-divergence window (35000-38900) stays quiet.  The
    npz samples every 100th D-step, so the guard window scales to the
    36-sample excerpt."""
    # (step, D_logits_diff, (|l_d_real|+|l_d_fake|)/2) — recorded values
    healthy = [(35000 + 100 * i, d, m) for i, (d, m) in enumerate(
        [(0.28, 0.30), (0.25, 0.35), (0.31, 0.28), (0.22, 0.42),
         (0.27, 0.33), (0.24, 0.46), (0.29, 0.31), (0.26, 0.38)] * 5)]
    diverged = [
        (39200, 0.0006, 0.248), (39400, 0.002, 0.30), (39600, 0.0035,
         0.388), (39800, -0.004, 0.35), (40000, -0.0089, 0.158),
        (40200, 0.003, 0.30), (40400, 0.0021, 0.41), (40600, -0.002,
         0.35), (40800, -0.0035, 0.293), (41000, 0.001, 0.5),
        (41200, 0.0017, 0.38), (41400, 0.002, 0.8), (41600, 0.0017,
         1.196), (41800, -0.001, 1.15), (42000, -0.0022, 1.109),
        (42200, 0.004, 0.9), (42400, 0.0092, 0.457), (42600, 0.006,
         0.7), (42800, 0.0056, 0.543), (43000, 0.003, 0.9)]

    def run(series, window):
        c = GANController()
        for _, d, m in series:
            c.record_d({'D_logits_diff': d, 'Correctly_distinguished': 0.5,
                        'l_d_real_0': m, 'l_d_fake_0': -m})
        return c.check_critic_collapse(window=window)

    # the rising edge: an 8-sample window ending at 42000 (the last
    # checkpoint of the diverged critic before the manual re-init; the
    # samples past 42000 are the FRESH re-initialized D recovering)
    assert run([s for s in diverged if s[0] <= 42000], window=8)
    assert not run(healthy, window=8)
    # and the recovering fresh-D samples after the re-init: quiet
    assert not run(diverged, window=8)


def test_gd_update_controller_linear_map():
    g = GDUpdateController([[1, 10], [0.0, 1.0]])
    g.update_ratio(1.0)
    assert g.dg_steps_ratio == pytest.approx(10)
    g.update_ratio(0.0)
    assert g.dg_steps_ratio == pytest.approx(1)


def test_sharded_d_step_runs_on_mesh(tiny_setup):
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    mesh = make_mesh(data=8, spatial=1)
    rules = ShardingRules(mesh)
    state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(4))
    state = rules.replicate(state)
    batch = rules.shard_batch(_batch(lr_size, patch, b=8))
    state1, metrics = trainer.d_step(state, batch, dual=False)
    assert np.isfinite(float(metrics['l_d_total']))


@pytest.mark.slow
def test_grad_accumulation_matches_single_batch(tiny_setup):
    """2 microbatches of 8 == one batch-16 step (bit-level, per-sample
    losses only — SRRaGAN_model.py:280-521 / options.py:134-157)."""
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    # pixel loss only: the 5000x range weight amplifies fp32 reduction
    # noise on heavily-cancelled bias grads to percent level (verified:
    # batch-permutation noise alone exceeds the accumulation difference)
    base = dict(trainer.cfg.__dict__, pixel_weight=1.0, range_weight=None,
                latent_weight=None, optimal_z_weight=None)
    cfg1 = TrainConfig(**base)
    cfg2 = TrainConfig(**dict(base, grad_accum_g=2))
    tr1 = SRRaGANTrainer(cfg1, trainer.g_apply, trainer.d_apply,
                         margins_hr=trainer.margins_hr)
    tr2 = SRRaGANTrainer(cfg2, trainer.g_apply, trainer.d_apply,
                         margins_hr=trainer.margins_hr)
    batch = _batch(lr_size, patch, b=16, seed=7)
    s1 = tr1.init_state(g_params, d_vars, jax.random.PRNGKey(9))
    s2 = tr2.init_state(g_params, d_vars, jax.random.PRNGKey(9))

    # gradient-level check: mean of two microbatch grads == full-batch grad
    rng, z_rng, map_rng = jax.random.split(s1.rng, 3)
    hr, lr_in = batch['hr'], batch['lr']
    z, svd = tr1.sample_z(z_rng, 16, hr.shape[1], hr.shape[2])
    ref = tr1.unpad(hr)
    def grads_of(idx):
        svd_i = None if svd is None else {k: v[idx] for k, v in svd.items()}
        g, _, _ = tr1._g_grads(s1, lr_in[idx], ref[idx], z[idx], svd_i,
                               map_rng, s1.ratio_stats, False, False)
        return g

    full_idx = np.arange(16)
    g_full = grads_of(full_idx)
    g_acc = jax.tree.map(lambda a, b: (a + b) / 2,
                         grads_of(full_idx[:8]), grads_of(full_idx[8:]))
    # fp32 yardstick: per-sample pixel grads cancel heavily, so compare the
    # accumulation error against the noise from merely permuting the batch
    # (mathematically identical mean, different reduction order)
    g_perm = grads_of(np.asarray([15, 3, 7, 0, 9, 12, 1, 14,
                                  2, 8, 5, 11, 4, 13, 6, 10]))
    scale = max(jax.tree.leaves(jax.tree.map(
        lambda a: float(jnp.abs(a).max()), g_full)))

    def noise(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b))) / scale
    assert noise(g_full, g_acc) <= 10 * noise(g_full, g_perm) + 1e-7

    # end-to-end step: identical up to Adam's lr*sign(g) sensitivity for
    # near-zero gradients under fp32 reduction-order noise (bounded by
    # 2*lr = 2e-5 per element)
    s1, m1 = tr1.g_step(s1, batch, dual=False, use_gan=False)
    s2, m2 = tr2.g_step(s2, batch, dual=False, use_gan=False)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.g_params, s2.g_params)
    assert max(jax.tree.leaves(diffs)) <= 2 * trainer.cfg.lr_g + 1e-9
    assert float(m1['l_g_pix']) == pytest.approx(float(m2['l_g_pix']),
                                                 abs=1e-6)


@pytest.mark.slow
def test_d_step_grad_accumulation_smoke(tiny_setup):
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    cfg = TrainConfig(**dict(trainer.cfg.__dict__, grad_accum_d=2))
    tr = SRRaGANTrainer(cfg, trainer.g_apply, trainer.d_apply,
                        margins_hr=trainer.margins_hr)
    state = tr.init_state(g_params, d_vars, jax.random.PRNGKey(11))
    state1, m = tr.d_step(state, _batch(lr_size, patch, b=8, seed=3),
                          dual=True)
    assert np.isfinite(float(m['l_d_total']))
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.d_vars['params'], state1.d_vars['params'])
    assert max(jax.tree.leaves(delta)) > 0


@pytest.mark.slow
def test_lr_scale_halves_effective_step(tiny_setup):
    """Rollback semantics: state.lr_scale scales the applied update exactly
    (the reference halves the optimizer LR, SRRaGAN_model.py:618-631)."""
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    batch = _batch(lr_size, patch, seed=5)
    s_full = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(6))
    s_half = s_full.replace(lr_scale=jnp.float32(0.5))
    out_full, _ = trainer.g_step(s_full, batch, dual=False, use_gan=False)
    out_half, _ = trainer.g_step(s_half, batch, dual=False, use_gan=False)

    def upd(new, old):
        return jax.tree.map(lambda a, b: a - b, new, old)
    u_full = upd(out_full.g_params, s_full.g_params)
    u_half = upd(out_half.g_params, s_half.g_params)
    # params are stored fp32 (~0.1 magnitude), so extracting a ~1e-5 update
    # by subtraction carries ~1e-8 representation error per term
    ratios = jax.tree.map(
        lambda a, b: float(jnp.abs(b - 0.5 * a).max()), u_full, u_half)
    assert max(jax.tree.leaves(ratios)) < 1e-7


def test_controller_verification_modes():
    good = {'D_logits_diff': 1.0, 'Correctly_distinguished': 1.0,
            'l_d_real_0': 0.1, 'l_d_fake_0': 0.1}
    # 'initial': once the window is good, verification sticks
    c = GANController(d_update_ratio=1, d_valid_steps_4_g=2,
                      d_verification='initial')
    c.step = 1
    assert not c.want_g_step()
    for _ in range(2):
        c.record_d(good)
    assert c.want_g_step() and c.d_verified
    # later bad steps don't un-verify
    c.record_d({**good, 'D_logits_diff': -5.0,
                'Correctly_distinguished': 0.0})
    assert c.want_g_step()
    # 'current': only the latest D step matters
    c2 = GANController(d_update_ratio=1, d_verification='current')
    c2.step = 1
    c2.record_d(good)
    assert c2.want_g_step()
    c2.record_d({**good, 'D_logits_diff': -1.0})
    assert not c2.want_g_step()
    # 'convergence': flat noisy loss trend converges
    c3 = GANController(d_update_ratio=1, d_verification='convergence',
                       steps_4_loss_std=20)
    c3.steps_4_d_convergence = 10
    c3.step = 30
    rng = np.random.default_rng(0)
    for i in range(30):
        c3.record_d({**good, 'l_d_real_0': float(rng.normal(1.0, 0.2)),
                     'l_d_fake_0': float(rng.normal(1.0, 0.2))})
    assert c3.want_g_step()


def test_mesh_step_chain_keeps_state_replicated(tiny_setup):
    """d_step -> g_step chaining on a data x spatial mesh: with donation
    and unconstrained outputs GSPMD could hand back a state leaf sharded
    on 'spatial', which then fails g_step's replicated in_shardings
    (regression: out_shardings now pinned in SRRaGANTrainer)."""
    cem, trainer, g_params, d_vars, lr_size, patch = tiny_setup
    from exsr.train.srragan import SRRaGANTrainer, TrainConfig
    mesh = make_mesh(data=4, spatial=2)
    rules = ShardingRules(mesh)
    tr = SRRaGANTrainer(TrainConfig(optimal_z_iters=2, steps_4_loss_std=5),
                        trainer.g_apply, trainer.d_apply,
                        margins_hr=trainer.margins_hr, rules=rules)
    state = rules.replicate(tr.init_state(g_params, d_vars,
                                          jax.random.PRNGKey(4)))
    batch = rules.shard_batch(_batch(lr_size, patch, b=8))
    state, d_metrics = tr.d_step(state, batch, dual=False)
    state, g_metrics = tr.g_step(state, batch, dual=False, use_gan=True)
    assert np.isfinite(float(d_metrics['l_d_total']))
    assert np.isfinite(float(g_metrics['l_g_total']))


@pytest.mark.slow
def test_decomposed_d_training(tiny_setup):
    """network_D.decomposed_input: the D judges the CEM (low, high) pair —
    fake pair to D, (fake_low, ref - fake_low) as the real pair, and the GP
    interpolates the full image while the D sees it split around the fixed
    low-freq component (SRRaGAN_model.py:84,330-332,349-369)."""
    from exsr.models.discriminators import PatchGANDiscriminator
    cem, trainer, g_params, _, lr_size, patch = tiny_setup
    d_input = patch - 2 * cem.invalidity_margins_hr
    d = PatchGANDiscriminator(ndf=8, n_layers=3, decomposed_input=True)
    x0 = jnp.zeros((1, d_input, d_input, 3))
    d_vars = dict(d.init(jax.random.PRNGKey(3), (x0, x0)))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=1, nf=16, gc=8, latent_channels=3)
    wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=4)
    cfg = TrainConfig(optimal_z_iters=2, steps_4_loss_std=5,
                      decomposed_d=True)
    tr = SRRaGANTrainer(
        cfg,
        lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False),
        flax_d_adapter(d), margins_hr=cem.invalidity_margins_hr,
        g_apply_decomp=lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False,
                                               decompose=True))
    state = tr.init_state(g_params, d_vars, jax.random.PRNGKey(4))
    batch = _batch(lr_size, patch, b=4)
    state1, d_metrics = tr.d_step(state, batch, dual=True)
    assert np.isfinite(float(d_metrics['l_d_total']))
    assert np.isfinite(float(d_metrics['l_d_gp_0']))
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.d_vars['params'], state1.d_vars['params'])
    assert max(jax.tree.leaves(delta)) > 0
    state2, g_metrics = tr.g_step(state1, batch, dual=True, use_gan=True)
    for k in ('l_g_gan', 'l_g_latent', 'l_g_total'):
        assert np.isfinite(float(g_metrics[k])), k
    delta_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state1.g_params, state2.g_params)
    assert max(jax.tree.leaves(delta_g)) > 0


@pytest.mark.slow
def test_train_sr_cli_end_to_end(tmp_path):
    """train_sr CLI at a tiny config: data -> compiled steps -> checkpoint
    -> logs.npz + PDF dashboards -> resume continues from the restored
    step (train.py:21-204 surface, run end-to-end rather than per-piece)."""
    import os
    from PIL import Image
    rng = np.random.default_rng(0)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(3):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    exp = str(tmp_path / 'exp')
    args = ['--hr_dir', str(hr_dir), '--val_hr_dir', str(hr_dir),
            '--scale', '4', '--patch', '112', '--batch', '2',
            '--nb', '1', '--nf', '8', '--d_nb', '4', '--d_nf', '8',
            '--d_strides', '1', '--exp_dir', exp, '--print_freq', '1',
            '--val_freq', '2', '--ckpt_freq', '2']
    from exsr.apps.train_sr import main
    main(args + ['--niter', '3'])
    assert os.path.exists(os.path.join(exp, 'logs.npz'))
    assert any(f.endswith('.pdf')
               for f in os.listdir(os.path.join(exp, 'dashboards')))
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('psnr_val') is not None      # validation ran
    assert m.last('l_d_total') is not None     # D actually stepped
    # resume: continues past the restored step to the new niter
    main(args + ['--niter', '5', '--resume'])
    m2 = MetricLog()
    m2.load(os.path.join(exp, 'logs.npz'))
    steps = [int(s) for s, _ in m2.series.get('l_d_total', [])]
    assert max(steps) >= 4


def test_train_sr_cli_accum_flags(tmp_path):
    """--accum_g/--accum_d thread into the compiled steps (virtual-batch
    microbatch scans, options.py:134-157 semantics) — the CLI path used
    on the real TPU when the adversarial G step exceeds HBM at the
    flagship batch."""
    import os
    from PIL import Image
    rng = np.random.default_rng(2)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    exp = str(tmp_path / 'exp')
    from exsr.apps.train_sr import main
    main(['--hr_dir', str(hr_dir), '--scale', '4', '--patch', '112',
          '--batch', '2', '--nb', '1', '--nf', '8', '--d_nb', '4',
          '--d_nf', '8', '--d_strides', '1', '--exp_dir', exp,
          '--print_freq', '1', '--niter', '2',
          '--accum_g', '2', '--accum_d', '2'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('l_d_total') is not None


@pytest.mark.slow
def test_train_sr_cli_init_phase(tmp_path):
    """--init_phase: G-only pixel+range pretraining (the zero-egress
    stand-in for the reference's pretrained-ESRGAN warm start), then a
    GAN-phase resume from its checkpoint."""
    import os
    from PIL import Image
    rng = np.random.default_rng(1)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    exp = str(tmp_path / 'exp')
    args = ['--hr_dir', str(hr_dir), '--scale', '4', '--patch', '112',
            '--batch', '2', '--nb', '1', '--nf', '8', '--d_nb', '4',
            '--d_nf', '8', '--d_strides', '1', '--exp_dir', exp,
            '--print_freq', '1', '--ckpt_freq', '1']
    from exsr.apps.train_sr import main
    main(args + ['--init_phase', '--niter', '2'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('l_g_pix') is not None      # pixel loss active
    assert m.last('l_d_total') is None        # and no D steps ran
    # GAN-phase resume from the init checkpoint
    main(args + ['--niter', '4', '--resume'])
    m2 = MetricLog()
    m2.load(os.path.join(exp, 'logs.npz'))
    assert m2.last('l_d_total') is not None   # D started


@pytest.mark.slow
def test_train_sr_cli_warm_g(tmp_path):
    """--warm_g: pretrained-G warm start with fresh D/optimizers — the
    reference's path.pretrained_model_G load (base_model.py:146-190,
    train_explorable_SR.json). Round-trips through scripts export_g and
    asserts the new run's G params are EXACTLY the exported ones (the
    first GAN-phase steps are D-only while the verification gate is
    closed, so G must be untouched after 1 step)."""
    import os
    from PIL import Image
    rng = np.random.default_rng(7)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    base = ['--hr_dir', str(hr_dir), '--scale', '4', '--patch', '112',
            '--batch', '2', '--nb', '1', '--nf', '8', '--d_nb', '4',
            '--d_nf', '8', '--d_strides', '1', '--print_freq', '1',
            '--ckpt_freq', '1']
    from exsr.apps.train_sr import main
    exp1 = str(tmp_path / 'exp1')
    main(base + ['--exp_dir', exp1, '--init_phase', '--niter', '2'])
    from exsr.apps.scripts import export_g
    gdir = str(tmp_path / 'g_export')
    export_g(os.path.join(exp1, 'ckpt'), gdir)
    exp2 = str(tmp_path / 'exp2')
    main(base + ['--exp_dir', exp2, '--warm_g', gdir, '--niter', '1'])
    from exsr.train.checkpoints import CheckpointManager
    import jax
    exported = CheckpointManager(gdir).restore_raw()['g_params']
    got = CheckpointManager(
        os.path.join(exp2, 'ckpt')).restore_raw()['g_params']
    deltas = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                          exported, got)
    assert max(jax.tree.leaves(deltas)) == 0.0
    # and the warm start is ignored under --resume
    main(base + ['--exp_dir', exp2, '--warm_g', gdir, '--niter', '2',
                 '--resume'])


@pytest.mark.slow
def test_train_jpeg_cli_end_to_end(tmp_path):
    """train_jpeg CLI at a tiny config: data -> compiled steps ->
    checkpoint -> logs.npz + validation (train_JPEG.py:20-152 surface)."""
    import os
    from PIL import Image
    rng = np.random.default_rng(2)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(4):
        arr = (rng.uniform(size=(72, 72, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(d / f'im{i}.png')
    exp = str(tmp_path / 'exp')
    from exsr.apps.train_jpeg import main
    main(['--data_dir', str(d), '--val_dir', str(d), '--patch', '64',
          '--batch', '2', '--nf', '16', '--nb', '3', '--niter', '3',
          '--exp_dir', exp, '--print_freq', '1', '--val_freq', '2',
          '--ckpt_freq', '2'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('psnr_val') is not None
    assert m.last('l_d_total') is not None
    assert any(f.endswith('.pdf')
               for f in os.listdir(os.path.join(exp, 'dashboards')))


@pytest.mark.slow
def test_train_sr_cli_plain_esrgan(tmp_path):
    """The plain ESRGAN/SRGAN variant via a reference-style config
    (train_esrgan.json: CEM_arch=0, latent_input='None',
    latent_channels=0, pixel+feature+vanilla-GAN): no CEM wrap, no Z,
    perceptual VGG loss wired (networks.py define_F,
    SRGAN_model.py:17)."""
    import json as _json
    import os
    from PIL import Image
    rng = np.random.default_rng(5)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    opt = {
        'name': 'tiny_esrgan', 'model': 'srragan', 'scale': 4,
        'datasets': {'train': {
            'name': 't', 'mode': 'LRHR', 'dataroot_HR': str(hr_dir),
            'dataroot_LR': None, 'batch_size': 2, 'patch_size': 64,
            'use_flip': True, 'use_rot': True, 'n_workers': 0}},
        'path': {'root': str(tmp_path)},
        'network_G': {'which_model_G': 'RRDB_net', 'CEM_arch': 0,
                      'latent_input': 'None', 'latent_channels': 0,
                      'nf': 8, 'nb': 1, 'in_nc': 3, 'out_nc': 3, 'gc': 4},
        'network_D': {'which_model_D': 'discriminator_vgg_128',
                      'norm_type': 'batch', 'nf': 8, 'in_nc': 3,
                      'n_layers': 4, 'num_2_strides': 1},
        'train': {'lr_G': 1e-4, 'lr_D': 1e-4, 'gan_type': 'vanilla',
                  'gan_weight': 0.005, 'pixel_weight': 0.01,
                  'pixel_criterion': 'l1', 'feature_weight': 1.0,
                  'niter': 2, 'D_update_ratio': 1,
                  'val_freq': 1000, 'lr_steps': [], 'lr_gamma': 0.5},
    }
    opt_path = tmp_path / 'esrgan.json'
    opt_path.write_text(_json.dumps(opt))
    exp = str(tmp_path / 'exp_esrgan')
    from exsr.apps.train_sr import main
    main(['--opt', str(opt_path), '--hr_dir', str(hr_dir),
          '--exp_dir', exp, '--print_freq', '1'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('l_d_total') is not None
    # the perceptual term contributed to the G loss
    assert m.last('l_g_total') is not None


@pytest.mark.slow
def test_train_sr_cli_msrresnet_srgan(tmp_path):
    """train_srgan.json variant: MSRResNet generator (DTE_arch=0 — the
    pre-rename CEM flag — and no latent input), vanilla GAN
    (architecture.py:18-66, SRGAN_model.py)."""
    import json as _json
    import os
    from PIL import Image
    rng = np.random.default_rng(6)
    hr_dir = tmp_path / 'hr'
    hr_dir.mkdir()
    for i in range(2):
        arr = (rng.uniform(size=(128, 128, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(hr_dir / f'im{i}.png')
    opt = {
        'name': 'tiny_srgan', 'model': 'srgan', 'scale': 4,
        'datasets': {'train': {
            'name': 't', 'mode': 'LRHR', 'dataroot_HR': str(hr_dir),
            'dataroot_LR': None, 'batch_size': 2, 'patch_size': 64,
            'n_workers': 0}},
        'path': {'root': str(tmp_path)},
        'network_G': {'which_model_G': 'MSRResNet', 'DTE_arch': 0,
                      'latent_input': 'None', 'latent_channels': 0,
                      'nf': 8, 'nb': 2, 'in_nc': 3, 'out_nc': 3},
        'network_D': {'which_model_D': 'discriminator_vgg_128',
                      'norm_type': 'batch', 'nf': 8, 'in_nc': 3,
                      'n_layers': 4, 'num_2_strides': 1},
        'train': {'lr_G': 1e-4, 'lr_D': 1e-4, 'gan_type': 'vanilla',
                  'gan_weight': 0.005, 'pixel_weight': 0.01,
                  'pixel_criterion': 'l1', 'niter': 2,
                  'D_update_ratio': 1, 'lr_steps': [], 'lr_gamma': 0.5},
    }
    opt_path = tmp_path / 'srgan.json'
    opt_path.write_text(_json.dumps(opt))
    exp = str(tmp_path / 'exp_srgan')
    from exsr.apps.train_sr import main
    main(['--opt', str(opt_path), '--hr_dir', str(hr_dir),
          '--exp_dir', exp, '--print_freq', '1'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('l_d_total') is not None


@pytest.mark.slow
def test_train_jpeg_chroma_cli(tmp_path):
    """train_jpeg --chroma end-to-end: the ModelChroma phase
    (train_JPEG.py variant collapse; DecompCNN_model.py:379-383) trains
    the low-freq chroma generator, and the resulting checkpoint loads
    straight into JPEGEditSession.attach_chroma for trained-chroma
    decoding."""
    import json as _json
    import os
    from PIL import Image
    rng = np.random.default_rng(7)
    d = tmp_path / 'imgs'
    d.mkdir()
    for i in range(3):
        arr = (rng.uniform(size=(64, 64, 3)) * 255).astype('uint8')
        Image.fromarray(arr).save(d / f'im{i}.png')
    exp = str(tmp_path / 'exp_chroma')
    from exsr.apps.train_jpeg import main
    main(['--data_dir', str(d), '--val_dir', str(d), '--chroma',
          '--patch', '32', '--batch', '2', '--nf', '8', '--nb', '2',
          '--niter', '2', '--exp_dir', exp, '--print_freq', '1',
          '--val_freq', '2', '--ckpt_freq', '1'])
    from exsr.utils.logging import MetricLog
    m = MetricLog()
    m.load(os.path.join(exp, 'logs.npz'))
    assert m.last('l_g_pix') is not None
    assert m.last('psnr_chroma_val') is not None
    # the trained chroma checkpoint plugs into the session
    from exsr.train.checkpoints import CheckpointManager
    from exsr.apps.jpeg_session import JPEGEditSession
    raw = CheckpointManager(os.path.join(exp, 'ckpt')).restore_raw()
    s = JPEGEditSession(nf=8, nb=2, qf=20)
    s.init_random_params(0)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    s.open_image(img)
    s.attach_chroma(raw['gc_params'], nf=8, nb=2)
    cbcr = s.decode_chroma()
    assert cbcr.shape == (48, 48, 2)
    assert np.isfinite(cbcr).all()


def test_install_sigint_stop_cooperative_then_hard():
    """First SIGINT sets the cooperative stop flag (so the trainers'
    forced final checkpoint save still runs — the r5 JPEG deadline run
    lost its entire state to a raw KeyboardInterrupt); the handler then
    restores the previous handler so a second SIGINT hard-interrupts."""
    import os
    import signal

    import pytest

    from exsr.utils.misc import install_sigint_stop

    prev = signal.getsignal(signal.SIGINT)
    signal.signal(signal.SIGINT, signal.default_int_handler)
    try:
        stop = install_sigint_stop()
        assert not stop()
        os.kill(os.getpid(), signal.SIGINT)   # delivered synchronously
        assert stop()
        # handler restored: the next SIGINT is the default hard interrupt
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
        # trainers call .restore() after the loop so in-process callers
        # don't inherit the cooperative handler
        stop2 = install_sigint_stop()
        stop2.restore()
        assert (signal.getsignal(signal.SIGINT)
                is signal.default_int_handler)
    finally:
        signal.signal(signal.SIGINT, prev)
