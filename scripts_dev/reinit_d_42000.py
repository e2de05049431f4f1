"""Surgical D re-initialization for the run50k2 training run at step 42000.

What happened (see scripts_dev/run50k2.sh): raising lr_D 1e-5 -> 1e-4 at
the 39k resume DIVERGED the wgan-gp critic within ~1k steps — D_real and
D_fake collapsed onto the same inflating value (D_logits_diff ~ 0 while
|D| and the gradient penalty grew monotonically), an instability mode the
D-loss-STD detector is structurally blind to (it monitors the std of
(l_d_real + l_d_fake)/2, which cancels exactly when the critic outputs
are symmetric).  Orbax's max_to_keep=3 pruning had already dropped the
last pre-divergence checkpoint (39000) by the time the divergence was
diagnosed, so a restore-based rollback was impossible.

The generator NEVER stepped in the GAN phase (the verification gate never
opened), so the G side of EVERY checkpoint — params and adam state — is
identical and clean.  This script therefore rebuilds the step-42000
checkpoint with:

  * the G side (params + optimizer state + rng + step counter) restored
    verbatim from the diverged checkpoint,
  * a FRESH discriminator and D-optimizer — switched to the reference's
    actual flagship D configuration: Discriminator_VGG_128 with the
    default num_2_strides=5 FC head and nf=64
    (architecture.py:447 defaults; train_explorable_SR.json network_D),
    the configuration whose gate demonstrably opens at lr_D=1e-5
    (r3 convergence artifact: gate at step 4300).  The num_2_strides=2
    patch head was this run's experiment and its separation plateaued at
    ~0.85 mean accuracy, below the all-of-last-10 > 0.9 gate bar,
  * lr restored to the reference 1e-5 and a reset controller window.

Run (CPU is fine — checkpoints are platform-portable):
    JAX_PLATFORMS=cpu python scripts_dev/reinit_d_42000.py
then resume:
    python -m exsr.apps.train_sr --opt experiments/run50k2/opt.json ... --resume
"""
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

EXP = os.path.join(ROOT, 'experiments/run50k2')
STEP = 42000
SEED = 0


def main():
    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.discriminators import DiscriminatorVGG128
    from exsr.parallel.mesh import make_mesh, ShardingRules
    from exsr.train.srragan import SRRaGANTrainer, flax_d_adapter
    from exsr.train.checkpoints import CheckpointManager
    from exsr.options.config import parse, experiment_from_reference_json

    exp = experiment_from_reference_json(
        parse(os.path.join(EXP, 'opt.json'), is_train=True))
    cfg = exp.train
    nz = cfg.num_latent_channels
    cem = CEM.create(CEMConf(scale_factor=cfg.scale))
    filt = cem.device_filters(3)
    margins_hr = cem.invalidity_margins_hr
    d_input = cfg.patch_size - 2 * margins_hr
    lr_patch = cfg.patch_size // cfg.scale

    rng = jax.random.PRNGKey(SEED)
    g = RRDBNet(nb=exp.network_g.nb, nf=exp.network_g.nf,
                upscale=cfg.scale, latent_channels=nz)
    g_params = g.init(rng, jnp.zeros((1, lr_patch, lr_patch, 3)),
                      jnp.zeros((1, cfg.patch_size, cfg.patch_size, nz)))
    raw_apply = lambda pp, x, z: g.apply(pp, x, z if nz else None)
    wrapped = cem_wrap(raw_apply, filt, upscale=cfg.scale)
    g_apply = lambda pp, x, z: wrapped(pp, x, z, 0, pre_pad=False)

    mesh = make_mesh(data=1, spatial=1, devices=jax.devices()[:1])
    rules = ShardingRules(mesh)
    d_init_x = jnp.zeros((1, d_input, d_input, 3))

    def build(num_2_strides, base_nf, d_seed):
        d = DiscriminatorVGG128(base_nf=base_nf, nb=10,
                                num_2_strides=num_2_strides,
                                input_patch_size=d_input)
        d_vars = dict(d.init(jax.random.PRNGKey(d_seed), d_init_x))
        trainer = SRRaGANTrainer(cfg, g_apply, flax_d_adapter(d),
                                 margins_hr=margins_hr, rules=rules)
        return trainer.init_state(g_params, d_vars,
                                  jax.random.PRNGKey(SEED + 2))

    # 1) typed restore of the diverged checkpoint via the OLD (patch-head,
    #    nf=64 — network_D.nf was not wired to the CLI then) template
    old_template = build(num_2_strides=2, base_nf=64, d_seed=SEED + 1)
    old_ckpts = CheckpointManager(os.path.join(EXP, 'ckpt'))
    old_state = old_ckpts.restore(old_template)
    assert int(old_state.step) == STEP, int(old_state.step)

    # 2) fresh state with the reference flagship FC-head D, G side grafted
    new_state = build(num_2_strides=5, base_nf=64, d_seed=SEED + 101)
    new_state = new_state.replace(
        step=old_state.step,
        g_params=old_state.g_params,
        g_opt=old_state.g_opt,
        rng=old_state.rng,
        lr_scale=jnp.asarray(1.0, jnp.float32))

    # 3) move the diverged checkpoint aside and write the repaired one
    graveyard = os.path.join(EXP, 'ckpt_diverged_lrd1e-4')
    os.makedirs(graveyard, exist_ok=True)
    shutil.move(os.path.join(EXP, 'ckpt', str(STEP)),
                os.path.join(graveyard, f'{STEP}'))
    new_ckpts = CheckpointManager(os.path.join(EXP, 'ckpt'),
                                  max_to_keep=3, save_interval_steps=1)
    new_ckpts.save(STEP, new_state, controller_state={
        'step': STEP,
        'generator_started_learning': False,
        'verified_d_saved': False,
        'lr_scale': 1.0})
    new_ckpts.wait() if hasattr(new_ckpts, 'wait') else None
    print(f'rebuilt ckpt {STEP}: G side restored, FC-head D (nf=64, '
          f'num_2_strides=5) freshly initialized, lr_scale reset to 1.0')


if __name__ == '__main__':
    main()
