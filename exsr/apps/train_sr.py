"""Explorable-SR training CLI — the reference's codes/train.py re-designed.

Wires: datasets -> sharded batches -> compiled D/G steps -> host controller
(gating, instability rollback) -> orbax checkpoints -> periodic validation
at Z in {0, -1, 1} with PSNR + per-pixel-STD diversity (train.py:21-204,
SRRaGAN_model.perform_validation:533-590).

Usage:
  python -m exsr.apps.train_sr --hr_dir DIR [--val_hr_dir DIR] --scale 4 \
      [--opt reference_options.json] [--niter N] [--batch 16] ...
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def default_collapse_guard(gan_type: str | None) -> bool:
    """Collapse-guard arming default when the CLI flag is not given.

    ON for wgan-family losses — the symmetric-collapse mode the guard
    detects (controller.check_critic_collapse) is a wgan critic failure
    observed live (r4 lr_D=1e-4 divergence), its thresholds are
    calibrated on wgan loss scales, and the hardened predicate survived
    10k+ live flagship wgan-gp steps without a false positive.  OFF for
    sigmoid/vanilla GAN losses, whose bounded ~0.69-at-chance log-losses
    sit inside the magnitude thresholds and would false-positive.
    """
    return bool(gan_type) and gan_type.startswith('wgan')


def main(argv=None):
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--opt', help='reference-style options JSON (optional)')
    p.add_argument('--hr_dir', required=True)
    p.add_argument('--lr_dir')
    p.add_argument('--val_hr_dir')
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--patch', type=int, default=208)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--nb', type=int, default=23)
    p.add_argument('--nf', type=int, default=64)
    p.add_argument('--gc', type=int, default=32,
                   help='RRDB dense-growth channels (network_G.gc)')
    p.add_argument('--d_nb', type=int, default=10)
    p.add_argument('--d_nf', type=int, default=64)
    p.add_argument('--d_strides', type=int, default=5)
    p.add_argument('--niter', type=int, default=None)
    p.add_argument('--accum_g', type=int, default=1,
                   help='G-step gradient-accumulation microbatches '
                        '(virtual batch semantics, options.py:134-157); '
                        'use 2+ when the adversarial G step exceeds HBM '
                        'at the flagship batch')
    p.add_argument('--accum_d', type=int, default=1,
                   help='D-step gradient-accumulation microbatches')
    p.add_argument('--exp_dir', default='experiments/explorable_sr')
    p.add_argument('--val_freq', type=int, default=500)
    p.add_argument('--ckpt_freq', type=int, default=1000)
    p.add_argument('--max_keep', type=int, default=3,
                   help='checkpoints retained; raise when arming rollback '
                        'guards so the restore-before-step target survives '
                        'pruning (the r4 50k run lost its pre-divergence '
                        'checkpoint to max_to_keep=3)')
    p.add_argument('--print_freq', type=int, default=100)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--tensorboard', action='store_true',
                   help='also write TB event files (optional dep; '
                        'logger.py:60-81 parity)')
    p.add_argument('--vgg_pth',
                   help='torchvision vgg19 weights (.pth/.npz) for the '
                        'perceptual feature loss when the config sets '
                        'feature_weight (train_esrgan.json); seeded '
                        'random VGG when omitted')
    p.add_argument('--warm_g',
                   help='warm-start the generator from an export_g '
                        '{"g_params"} checkpoint dir (or a full train-state '
                        'ckpt) with fresh D/optimizers — the reference\'s '
                        'path.pretrained_model_G load (base_model.py:146-190,'
                        ' train_explorable_SR.json:40); ignored when '
                        '--resume finds checkpoints')
    p.add_argument('--collapse_guard', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='arm the symmetric-critic-collapse rollback '
                        '(controller.check_critic_collapse) — an exsr '
                        'extension for wgan-type losses: rolls back with '
                        'halved LR when |D_logits_diff| ~ 0 while the '
                        'critic outputs inflate, a divergence mode the '
                        "reference's D-loss-STD trigger cancels on. "
                        'Default: ON for wgan-type gan_type (calibrated '
                        'on three real runs incl. a replayed live '
                        'divergence + a live fire, artifacts/'
                        'collapse_fire_r5), OFF otherwise — the '
                        'magnitude threshold assumes wgan loss scales '
                        '(vanilla GAN logs ~0.69 at chance and would '
                        'false-positive); --no-collapse_guard disarms')
    p.add_argument('--init_phase', action='store_true',
                   help='pixel+range pretraining (no GAN/D) — the '
                        'zero-egress stand-in for the reference\'s '
                        'pretrained-ESRGAN warm start '
                        '(path.pretrained_model_G in '
                        'train_explorable_SR.json); resume without this '
                        'flag afterwards for the GAN phase')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from exsr.cem.cem import CEM, CEMConf, cem_wrap
    from exsr.models.rrdb import RRDBNet
    from exsr.models.discriminators import DiscriminatorVGG128
    from exsr.parallel.mesh import make_mesh, ShardingRules
    from exsr.train.srragan import (SRRaGANTrainer, TrainConfig,
                                    flax_d_adapter)
    from exsr.train.controller import GANController
    from exsr.train.checkpoints import CheckpointManager
    from exsr.data.datasets import LRHRDataset, DataLoader
    from exsr.utils.metrics import calculate_psnr, crop_border
    from exsr.utils.misc import (stage_scalars, read_scalars,
                                 install_sigint_stop)
    from exsr.utils.color import tensor2img
    from exsr.utils.logging import MetricLog, TensorboardWriter

    cfg = TrainConfig(scale=args.scale, patch_size=args.patch)
    use_cem = True
    if args.opt:
        from exsr.options.config import parse, experiment_from_reference_json
        exp = experiment_from_reference_json(parse(args.opt, is_train=True))
        cfg = exp.train
        # the steps receive the full virtual batch and scan grad_accum_*
        # microbatches internally (options.py:134-157 semantics)
        args.batch = exp.train_data.batch_size
        # honor the JSON's generator architecture unless flags override;
        # CEM_arch=0 + latent_channels=0 is the plain ESRGAN/SRGAN
        # variant (train_esrgan.json, SRGAN_model.py) — no CEM wrap, no Z
        net_g = exp.network_g
        if args.nb == p.get_default('nb'):
            args.nb = net_g.nb
        if args.nf == p.get_default('nf'):
            args.nf = net_g.nf
        if net_g.gc and args.gc == p.get_default('gc'):
            args.gc = net_g.gc
        use_cem = net_g.cem_arch
        if exp.network_d.n_layers and args.d_nb == p.get_default('d_nb'):
            args.d_nb = exp.network_d.n_layers
        if exp.network_d.nf and args.d_nf == p.get_default('d_nf'):
            args.d_nf = exp.network_d.nf
        if exp.network_d.num_2_strides is not None and \
                args.d_strides == p.get_default('d_strides'):
            args.d_strides = exp.network_d.num_2_strides
    if args.niter:
        cfg = cfg.__class__(**{**cfg.__dict__, 'niter': args.niter})
    if args.accum_g > 1 or args.accum_d > 1:
        # override each field only when its own flag was set — an --opt
        # JSON may have configured the other one (batch_size_4_grads_*)
        cfg = cfg.__class__(**{
            **cfg.__dict__,
            'grad_accum_g': (args.accum_g if args.accum_g > 1
                             else cfg.grad_accum_g),
            'grad_accum_d': (args.accum_d if args.accum_d > 1
                             else cfg.grad_accum_d)})
    if args.init_phase:
        # L1 pixel + range only, higher LR, no MAP/latent/GAN terms
        cfg = cfg.__class__(**{**cfg.__dict__, 'pixel_weight': 1.0,
                               'feature_weight': None, 'gan_weight': 0.0,
                               'optimal_z_weight': None,
                               'latent_weight': None, 'lr_g': 2e-4})

    if args.collapse_guard is None:
        args.collapse_guard = default_collapse_guard(cfg.gan_type)
    print(f'collapse_guard armed: {args.collapse_guard} '
          f'(gan_type={cfg.gan_type})', flush=True)

    nz = cfg.num_latent_channels
    if use_cem:
        cem = CEM.create(CEMConf(scale_factor=cfg.scale))
        filt = cem.device_filters(3)
        margins_hr = cem.invalidity_margins_hr
        margins_lr = cem.invalidity_margins_lr
    else:
        cem = filt = None
        margins_hr = margins_lr = 0
    d_input = cfg.patch_size - 2 * margins_hr
    if d_input <= 0:
        raise SystemExit(
            f'patch_size {cfg.patch_size} leaves the D no input after '
            f'cropping 2x{margins_hr} CEM invalidity margins — use '
            f'patch_size > {2 * margins_hr}')
    decomposed_d = bool(args.opt and exp.network_d.decomposed_input
                        and use_cem)
    if decomposed_d:
        # network_D.decomposed_input=1 -> two-stream PatchGAN judging the
        # CEM (low, high) pair (SRRaGAN_model.py:84; architecture.py:359-387)
        from exsr.models.discriminators import PatchGANDiscriminator
        # the reference forwards the JSON's n_layers to the PatchGAN too
        # (networks.py:148) — honor it when set, else keep the 3-layer
        # 70x70 default (args.d_nb's 10 default is the VGG128 depth, not
        # a PatchGAN request)
        d_kwargs = dict(ndf=args.d_nf, decomposed_input=True,
                        pre_clipping=exp.network_d.pre_clipping)
        if exp.network_d.n_layers:
            d_kwargs['n_layers'] = args.d_nb
        d = PatchGANDiscriminator(**d_kwargs)
        cfg = cfg.__class__(**{**cfg.__dict__, 'decomposed_d': True})
    else:
        d = DiscriminatorVGG128(base_nf=args.d_nf, nb=args.d_nb,
                                num_2_strides=args.d_strides,
                                input_patch_size=d_input)
    lr_patch = cfg.patch_size // cfg.scale
    rng = jax.random.PRNGKey(args.seed)
    which_g = exp.network_g.which_model if args.opt else 'RRDB_net'
    if which_g in ('MSRResNet', 'sr_resnet'):
        # the legacy SRGAN-era generators (train_srgan.json,
        # architecture.py:18-103) — Z-less by construction
        from exsr.models.classifiers import MSRResNet, SRResNet
        assert nz == 0, f'{which_g} has no latent input'
        cls = MSRResNet if which_g == 'MSRResNet' else SRResNet
        g = cls(nf=args.nf, nb=args.nb, upscale=cfg.scale)
        g_params = g.init(rng, jnp.zeros((1, lr_patch, lr_patch, 3)))
        raw_apply = lambda pp, x, z: g.apply(pp, x)
    else:
        g = RRDBNet(nb=args.nb, nf=args.nf, gc=args.gc, upscale=cfg.scale,
                    latent_channels=nz)
        g_params = g.init(rng, jnp.zeros((1, lr_patch, lr_patch, 3)),
                          jnp.zeros((1, cfg.patch_size,
                                     cfg.patch_size, nz))
                          if nz else None)
        # RRDBNet takes z=None when there are no latent channels; the
        # trainer always feeds a (possibly 0-channel) z array
        raw_apply = lambda pp, x, z: g.apply(pp, x, z if nz else None)
    d_init_x = jnp.zeros((1, d_input, d_input, 3))
    d_vars = dict(d.init(jax.random.PRNGKey(args.seed + 1),
                         (d_init_x, d_init_x) if decomposed_d else d_init_x))
    if use_cem:
        wrapped = cem_wrap(raw_apply, filt, upscale=cfg.scale)
    else:
        # same call shape as the CEM wrapper so validate() is uniform
        wrapped = lambda pp, x, z, m, pre_pad=True: raw_apply(pp, x, z)
    g_apply = lambda pp, x, z: wrapped(pp, x, z, 0, pre_pad=False)
    g_apply_decomp = (
        (lambda pp, x, z: wrapped(pp, x, z, 0, pre_pad=False,
                                  decompose=True))
        if decomposed_d else None)
    f_apply = None
    if cfg.feature_weight:
        # perceptual VGG feature loss (train_esrgan.json feature_weight;
        # networks.py define_F) — converted torchvision weights when
        # provided, seeded random otherwise (zero-egress image)
        from exsr.models.vgg import VGG19Features, load_torch_vgg19_features
        vggm = VGG19Features()
        if args.vgg_pth:
            fvars = load_torch_vgg19_features(args.vgg_pth)
        else:
            print('feature loss active with RANDOM VGG weights — pass '
                  '--vgg_pth for the reference behavior')
            fvars = vggm.init(jax.random.PRNGKey(args.seed + 9),
                              jnp.zeros((1, 64, 64, 3)))
        f_apply = lambda x: vggm.apply(fvars, x)

    # data axis must divide the batch: use the largest device count that
    # does (all devices in the flagship configs; fewer for tiny batches)
    import math
    n_data = math.gcd(args.batch, len(jax.devices()))
    mesh = make_mesh(data=n_data, spatial=1,
                     devices=jax.devices()[:n_data])
    rules = ShardingRules(mesh)
    trainer = SRRaGANTrainer(cfg, g_apply, flax_d_adapter(d),
                             margins_hr=margins_hr,
                             rules=rules, f_apply=f_apply,
                             g_apply_decomp=g_apply_decomp)
    state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(
        args.seed + 2))
    ctl = GANController(
        d_update_ratio=cfg.d_update_ratio,
        d_valid_steps_4_g=cfg.d_valid_steps_4_g_update,
        min_d_prob_ratio_4_g=cfg.min_d_prob_ratio_4_g,
        min_mean_d_correct=cfg.min_mean_d_correct,
        d_init_iters=cfg.d_init_iters,
        steps_4_loss_std=cfg.steps_4_loss_std,
        std_4_lr_drop=cfg.std_4_lr_drop,
        lr_gamma=cfg.lr_gamma,
        base_lr=min(cfg.lr_g, cfg.lr_d))

    os.makedirs(args.exp_dir, exist_ok=True)
    # persistent training curves: logs.npz + PDF dashboards (the
    # reference's save_log/display_log_figure, SRRaGAN_model.py:644-675,
    # base_model.py:211-274) and an optional tensorboard stream
    mlog = MetricLog()
    log_path = os.path.join(args.exp_dir, 'logs.npz')
    tb = (TensorboardWriter(os.path.join(args.exp_dir, 'tb'))
          if args.tensorboard else None)
    ckpts = CheckpointManager(os.path.abspath(
        os.path.join(args.exp_dir, 'ckpt')), max_to_keep=args.max_keep,
        save_interval_steps=args.ckpt_freq)
    if args.resume and ckpts.latest_step() is not None:
        state, ctl_state = ckpts.restore(state, with_controller=True)
        if ctl_state:
            ctl.step = ctl_state['step']
            ctl.generator_started_learning = \
                ctl_state['generator_started_learning']
            ctl.verified_d_saved = ctl_state['verified_d_saved']
            ctl.lr_scale = ctl_state['lr_scale']
            state = state.replace(
                lr_scale=jnp.asarray(ctl.lr_scale, jnp.float32))
        if os.path.exists(log_path):
            # drop any curve points past the restored step (load_log's
            # max-step truncation, SRRaGAN_model.py:654-675)
            mlog.load(log_path, max_step=ctl.step)
        print(f'resumed at step {ctl.step}')
    elif args.warm_g:
        # pretrained-G warm start with fresh D/optimizers — the
        # reference's path.pretrained_model_G load (base_model.py:146-190)
        raw = CheckpointManager(
            os.path.abspath(args.warm_g)).restore_raw()
        gp = raw.get('g_params', raw)
        state = state.replace(g_params=jax.tree.map(
            lambda new, old: jax.device_put(
                jnp.asarray(new, old.dtype), old.sharding),
            gp, state.g_params))
        print(f'warm-started G from {args.warm_g}')

    ds = LRHRDataset(hr_root=args.hr_dir, lr_root=args.lr_dir,
                     scale=cfg.scale, patch_size=cfg.patch_size,
                     train=True)
    loader = DataLoader(ds, batch_size=args.batch, seed=args.seed)
    val_ds = None
    if args.val_hr_dir:
        val_ds = LRHRDataset(hr_root=args.val_hr_dir, scale=cfg.scale,
                             train=False, patch_size=None)

    # jitted val forward: the eager cem_wrap call dispatches ~300 ops per
    # image over the tunnel (~25 ms RPC each — a 280px val pass measured
    # ~100 s); one compiled program per val shape makes it ~0.5 s
    @jax.jit
    def _val_fwd(gp, lr_in, z):
        return jnp.clip(wrapped(gp, lr_in, z, margins_lr, pre_pad=True),
                        0, 1)

    def validate(step):
        psnrs, stds = [], []
        for i in range(min(len(val_ds), 8)):
            item = val_ds[i]
            lr_in = item['lr'][None]
            zh = (lr_in.shape[1] * cfg.scale, lr_in.shape[2] * cfg.scale)
            outs = []
            for zval in ((0.0, -1.0, 1.0) if nz else (0.0,)):
                z = np.full((1, zh[0], zh[1], nz), zval, np.float32)
                outs.append(np.asarray(_val_fwd(
                    state.g_params, jnp.asarray(lr_in), jnp.asarray(z))))
            sr = tensor2img(outs[0])
            gt = tensor2img(item['hr'][None])
            psnrs.append(calculate_psnr(
                crop_border(sr.astype(np.float64), cfg.scale),
                crop_border(gt.astype(np.float64), cfg.scale)))
            stds.append(float(np.stack(outs).std(axis=0).mean()))
        rec = {'psnr_val': float(np.mean(psnrs)),
               'per_pix_STD_val': float(np.mean(stds))}
        print(json.dumps({'step': step, **rec}))
        mlog.append(step, **rec)
        if tb is not None:
            tb.log(step, **rec)

    def _ctl_snapshot():
        # ONE snapshot definition for both the periodic and the final
        # forced save — these diverging is exactly how resume-after-
        # finished broke before (missing field in one literal)
        return {'step': ctl.step,
                'generator_started_learning':
                    ctl.generator_started_learning,
                'verified_d_saved': ctl.verified_d_saved,
                'lr_scale': ctl.lr_scale}

    t0 = time.time()
    log_accum = {}
    pending = (None, None)   # staged (d, g) metrics of the previous step

    def apply_pending():
        d_st, g_st = pending
        if d_st is not None:
            dm = read_scalars(d_st)
            ctl.record_d({k: v for k, v in dm.items()
                          if np.ndim(v) == 0})
            log_accum.update({k: v for k, v in dm.items()
                              if np.ndim(v) == 0})
        if g_st is not None:
            log_accum.update({k: v for k, v in read_scalars(g_st).items()
                              if np.ndim(v) == 0})
            ctl.record_g()
    # per-phase wall-time accounting (printed as t_* ms/step with each
    # print_freq line): separates device-step enqueue, the one metric
    # fetch, and data feed — the three places a tunneled backend hides
    # per-step latency (this instrumentation found the 97%-host-overhead
    # regression the r4 fixes removed)
    tacc = {'t_data': 0.0, 't_step': 0.0, 't_fetch': 0.0}
    _tlast = time.perf_counter()
    # cross-epoch prefetch stream: with few training tiles an epoch is a
    # single batch, so the per-epoch iterator exposes the whole collate
    # latency to the step loop (0.3-0.8 s/step measured on the r5
    # flagship run); the stream keeps batches ready across boundaries
    # deadline SIGINTs stop cooperatively so the forced final save below
    # always runs (a raw KeyboardInterrupt loses up to ckpt_freq steps;
    # see install_sigint_stop)
    stop_requested = install_sigint_stop()
    for batch in loader.stream(0):
        if ctl.step >= cfg.niter or stop_requested():
            break
        batch = rules.shard_batch(
            {'lr': batch['lr'], 'hr': batch['hr']})
        _tn = time.perf_counter()
        tacc['t_data'] += _tn - _tlast
        _tlast = _tn
        dual = (cfg.optimal_z_weight is not None
                and ctl.generator_started_learning)
        if args.init_phase:
            do_d, do_g = False, True  # no D in the pretraining phase
        else:
            do_d = ctl.want_d_step()
            do_g = ctl.want_g_step()
        d_staged = g_staged = None
        if do_d:
            state, d_metrics = trainer.d_step(state, batch, dual=dual)
            d_staged = stage_scalars(d_metrics)
        if do_g:
            state, g_metrics = trainer.g_step(state, batch, dual=dual,
                                              use_gan=not
                                              args.init_phase)
            g_staged = stage_scalars(g_metrics)
        _tn = time.perf_counter()
        tacc['t_step'] += _tn - _tlast
        _tlast = _tn
        # pipelined metric recording: step t+1 is already enqueued
        # when step t's one-transfer fetch materializes, so the
        # tunnel round-trip overlaps device compute (measured 355 ms
        # synchronous -> ~RTT-free).  Controller gating therefore
        # sees records one step staler than the reference's
        # synchronous loop — the 10-consecutive-step verification
        # windows open at most one step later.
        apply_pending()
        pending = (d_staged, g_staged)
        _tn = time.perf_counter()
        tacc['t_fetch'] += _tn - _tlast
        _tlast = _tn
        state = trainer.advance(state)
        ctl.tick()

        if ctl.step % cfg.steps_4_loss_std == 0:
            rollback, too_low = ctl.check_lr_drop()
            if ctl.log['D_loss_STD']:
                # persist the rollback-decision series (the reference
                # logs it too, SRRaGAN_model.py:608-616) — the armed
                # threshold comparison must be auditable post-run
                s_, v_ = ctl.log['D_loss_STD'][-1]
                mlog.append(s_, D_loss_STD=v_)
            if too_low:
                print('LR below 1e-8 — stopping (instability).')
                return
            if not rollback and args.collapse_guard and \
                    ctl.check_critic_collapse():
                # symmetric-collapse guard (exsr extension; the
                # D-loss-STD trigger above is blind to this mode —
                # observed live on the r4 run, controller.py); shares
                # the D-loss-STD path's LR halving AND its <1e-8 abort
                too_low = ctl.halve_lr()
                rollback = True
                print('critic collapse detected '
                      '(|D_logits_diff| ~ 0 with inflating |l_d|)')
                if too_low:
                    print('LR below 1e-8 — stopping (instability).')
                    return
            if rollback:
                # the staged metrics of the step being discarded must
                # not leak into the post-rollback gating window / the
                # audited D_loss_STD series
                pending = (None, None)
                mlog.append(ctl.step, rollback_lr_scale=ctl.lr_scale)
                back_step, state = ckpts.restore_before(
                    state, ctl.step - cfg.steps_4_loss_std)
                # the halved scale applies to the compiled steps as a
                # traced scalar — no recompile (SRRaGAN_model.py:618-631)
                state = state.replace(
                    lr_scale=jnp.asarray(ctl.lr_scale, jnp.float32))
                print(f'instability rollback to step {back_step}, '
                      f'lr_scale={ctl.lr_scale}')
        if ctl.step % args.print_freq == 0:
            log_accum['steps_per_s'] = args.print_freq / max(
                time.time() - t0, 1e-9)
            t0 = time.time()
            for k in tacc:
                log_accum[k + '_ms'] = 1e3 * tacc[k] / args.print_freq
                tacc[k] = 0.0
            print(json.dumps({'step': ctl.step, **{
                k: round(v, 5) for k, v in log_accum.items()}}))
            mlog.append(ctl.step, **log_accum)
            if tb is not None:
                tb.log(ctl.step, **log_accum)
            mlog.save(log_path)
        if val_ds and ctl.step % args.val_freq == 0:
            validate(ctl.step)
        ckpts.save(ctl.step, state,
                   controller_state=_ctl_snapshot())
    stop_requested.restore()
    apply_pending()
    pending = (None, None)
    ckpts.save(ctl.step, state, force=True,
               controller_state=_ctl_snapshot())
    ckpts.wait()
    mlog.save(log_path)
    mlog.dashboard(os.path.join(args.exp_dir, 'dashboards'))
    if tb is not None:
        tb.close()
    print('training done at step', ctl.step)


if __name__ == '__main__':
    main()
