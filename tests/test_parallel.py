"""Mesh / sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from exsr.parallel.mesh import make_mesh, ShardingRules, local_batch_slice
from exsr.cem.cem import CEM, CEMConf


def test_mesh_and_rules():
    mesh = make_mesh(data=4, spatial=2)
    assert mesh.devices.shape == (4, 2)
    rules = ShardingRules(mesh)
    batch = {'lr': np.zeros((8, 16, 16, 3), np.float32),
             'qf': np.zeros((8,), np.float32)}
    sharded = rules.shard_batch(batch)
    assert sharded['lr'].sharding.spec == P('data', 'spatial', None, None)


def test_spatial_sharding_preserves_cem_output():
    """Sharding H over the 'spatial' axis must not change the CEM filter
    chain's values — XLA inserts the conv halo exchanges (the spatial
    analogue of sequence parallelism for this conv-only model family,
    SURVEY.md section 5)."""
    cem = CEM.create(CEMConf(scale_factor=4))
    filt = cem.device_filters(3)
    rng = np.random.default_rng(0)
    lr = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    gen = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)

    ref = np.asarray(filt.enforce(jnp.asarray(lr), jnp.asarray(gen)))

    mesh = make_mesh(data=2, spatial=4)
    spec = NamedSharding(mesh, P('data', 'spatial', None, None))
    lr_s = jax.device_put(lr, spec)
    gen_s = jax.device_put(gen, spec)
    out_s = jax.jit(filt.enforce, out_shardings=spec)(lr_s, gen_s)
    np.testing.assert_allclose(np.asarray(out_s), ref, atol=2e-5)


@pytest.mark.slow
def test_data_parallel_forward_matches_single_device():
    from exsr.models.rrdb import RRDBNet
    g = RRDBNet(nb=1, nf=8, gc=4, latent_channels=3)
    lr = np.random.default_rng(1).uniform(size=(8, 8, 8, 3)) \
        .astype(np.float32)
    z = np.zeros((8, 32, 32, 3), np.float32)
    params = g.init(jax.random.PRNGKey(0), jnp.asarray(lr[:1]),
                    jnp.asarray(z[:1]))
    ref = np.asarray(g.apply(params, jnp.asarray(lr), jnp.asarray(z)))
    mesh = make_mesh(data=8, spatial=1)
    rules = ShardingRules(mesh)
    out = jax.jit(g.apply)(rules.replicate(params),
                           jax.device_put(lr, rules.batch),
                           jax.device_put(z, rules.batch))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_local_batch_slice():
    s = local_batch_slice(16, process_index=1, process_count=4)
    assert (s.start, s.stop) == (4, 8)


@pytest.mark.slow
def test_d_step_hlo_actually_partitions_batch():
    """Guard against silent full replication: the compiled data-parallel
    d_step must (a) split the batch inputs across the 8-device mesh and
    (b) contain a cross-device gradient all-reduce.  Both disappear if
    ShardingRules.batch is dropped (SURVEY.md section 2.16)."""
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.train.srragan import SRRaGANTrainer, TrainConfig

    cem = CEM.create(CEMConf(scale_factor=4))
    filt = cem.device_filters(3)
    g = RRDBNet(nb=1, nf=16, gc=8, latent_channels=3)
    patch = 4 * (2 * cem.invalidity_margins_lr + 8)
    lr_size = patch // 4
    g_params = g.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, lr_size, lr_size, 3)),
                      jnp.zeros((1, patch, patch, 3)))
    wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=4)
    g_apply = lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False)
    mesh = make_mesh(data=8, spatial=1)
    rules = ShardingRules(mesh)
    # trivial critic so the test isolates the G-side sharding
    trainer = SRRaGANTrainer(
        TrainConfig(optimal_z_iters=1, gan_type='vanilla'),
        g_apply, lambda v, x, u: (x.mean(axis=(1, 2, 3)), {}),
        margins_hr=cem.invalidity_margins_hr, rules=rules)
    state = trainer.init_state(g_params, {'params': {}},
                               jax.random.PRNGKey(1))
    batch = rules.shard_batch({
        'lr': jnp.zeros((8, lr_size, lr_size, 3)),
        'hr': jnp.zeros((8, patch, patch, 3))})
    lowered = trainer.g_step.lower(state, batch, dual=False, use_gan=False)
    compiled = lowered.compile()
    txt = compiled.as_text()
    # batch inputs are split 8-ways on the data axis...
    assert 'devices=[8' in txt, 'no 8-way sharded operand in the HLO'
    # ...so the mean-loss gradient needs a cross-device reduction
    assert 'all-reduce' in txt, 'no gradient all-reduce: batch replicated?'


@pytest.mark.slow
def test_jpeg_d_step_hlo_partitions_batch():
    """The JPEG trainer's data-parallel path (the reference wraps the
    DnCNN nets in DataParallel too, networks.py:157-181): compiled d_step
    splits the batch 8 ways and all-reduces gradients; one sharded step
    runs and matches the unsharded trainer bit-for-bit."""
    from exsr.models.dncnn import DnCNN, DnCNNConfig
    from exsr.train.decomp import DecompTrainer, DecompConfig

    cfg = DecompConfig(patch_size=16, latent_channels=4,
                       optimal_z_iters=1, gan_type='wgan-gp')
    g = DnCNN(DnCNNConfig(n_channels=16, depth=2, num_latent_channels=4))
    coeffs0 = jnp.zeros((1, 2, 2, 64))
    z0 = jnp.zeros((1, 2, 2, 4))
    g_vars = dict(g.init(jax.random.PRNGKey(0), coeffs0, z0))

    def g_apply(params, coeffs, z):
        return g.apply(params, coeffs, z)

    def d_apply(d_vars, x, update_stats):
        return x.mean(axis=(1, 2, 3)), {}

    mesh = make_mesh(data=8, spatial=1)
    rules = ShardingRules(mesh)
    trainer = DecompTrainer(cfg, g_apply, d_apply, rules=rules)
    state = trainer.init_state(g_vars, {'params': {}},
                               jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    host = {'uncomp': rng.uniform(0, 255, (8, 16, 16, 1))
            .astype(np.float32),
            'qf': np.full((8,), 10.0, np.float32)}
    batch = rules.shard_host_batch(host)
    assert batch['qf'].sharding.spec == P('data')

    lowered = trainer.d_step.lower(state, batch, dual=False)
    txt = lowered.compile().as_text()
    assert 'devices=[8' in txt, 'no 8-way sharded operand in the HLO'
    assert 'all-reduce' in txt, 'no gradient all-reduce: batch replicated?'

    # single-device reference FIRST: the sharded step donates (deletes)
    # its state, whose replicated shards alias the original g_vars
    # buffers on the CPU backend
    ref_trainer = DecompTrainer(cfg, g_apply, d_apply)
    ref_state = ref_trainer.init_state(g_vars, {'params': {}},
                                       jax.random.PRNGKey(1))
    _, ref_metrics = ref_trainer.d_step(
        ref_state, jax.tree.map(jnp.asarray, host), dual=False)

    state2, metrics = trainer.d_step(state, batch, dual=False)
    assert np.isfinite(float(metrics['l_d_total']))
    np.testing.assert_allclose(float(metrics['l_d_total']),
                               float(ref_metrics['l_d_total']), rtol=1e-5)
