"""Explorable-JPEG training CLI — the reference's codes/train_JPEG.py.

Usage:
  python -m exsr.apps.train_jpeg --data_dir DIR [--chroma] [--niter N] ...
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _make_rules(batch: int):
    """Batch-sharded data parallelism over every device whose count
    divides the batch (the train_sr CLI's auto-mesh; single-device this
    is a 1x1 mesh and a no-op)."""
    import math

    import jax
    from exsr.parallel.mesh import make_mesh, ShardingRules
    n_data = math.gcd(batch, len(jax.devices()))
    mesh = make_mesh(data=n_data, spatial=1,
                     devices=jax.devices()[:n_data])
    return ShardingRules(mesh)


def main(argv=None):
    from exsr.utils.compile import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data_dir', required=True,
                   help='uncompressed training image dir')
    p.add_argument('--val_dir')
    p.add_argument('--patch', type=int, default=256)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--nf', type=int, default=320)
    p.add_argument('--nb', type=int, default=10)
    p.add_argument('--latent_channels', default='64')
    p.add_argument('--qf_min', type=int, default=5)
    p.add_argument('--qf_max', type=int, default=50)
    p.add_argument('--niter', type=int, default=2_000_000)
    p.add_argument('--exp_dir', default='experiments/explorable_jpeg')
    p.add_argument('--print_freq', type=int, default=100)
    p.add_argument('--val_freq', type=int, default=1000)
    p.add_argument('--ckpt_freq', type=int, default=1000)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--d_verification', default='initial_gradual',
                   choices=['past', 'current', 'convergence', 'initial',
                            'initial_gradual'],
                   help="the reference JPEG recipe gates G on "
                        "'initial_gradual' (train_JPEG.json:93; "
                        'DecompCNN_model.py:536-567): once the D first '
                        'verifies, G steps flow, with a 100x-window '
                        're-verification before locking')
    p.add_argument('--min_d_correct', type=float, default=0.1,
                   help='min fraction correctly distinguished for the '
                        'verification window — the JPEG recipe uses the '
                        'lax 0.1 (train_JPEG.json:96), not SR\'s 0.9')
    p.add_argument('--chroma', action='store_true',
                   help='train the explorable-chroma generator conditioned '
                        'on a (frozen) Y generator — the reference '
                        'ModelChroma phase (train_JPEG.py, '
                        'DecompCNN_model.py:379-383,711-729)')
    p.add_argument('--y_ckpt',
                   help='trained Y-generator checkpoint to condition the '
                        'chroma model on (train_jpeg / export_g dir); '
                        'seeded random Y weights when omitted')
    p.add_argument('--y_latent_channels', type=int, default=64,
                   help='latent width of the conditioning Y generator')
    p.add_argument('--y_nf', type=int, default=None,
                   help='width of the conditioning Y generator (default: '
                        '--nf). The reference trains chroma at nf=160 '
                        'under a 320-wide Y model (GUI_JPEG.json)')
    p.add_argument('--y_nb', type=int, default=None,
                   help='depth of the conditioning Y generator '
                        '(default: --nb)')
    args = p.parse_args(argv)
    if args.chroma:
        return _main_chroma(args)

    import jax
    import jax.numpy as jnp
    from exsr.models.dncnn import DnCNN, DnCNNConfig, DnCNNDiscriminator
    from exsr.train.decomp import DecompTrainer, DecompConfig
    from exsr.train.srragan import flax_d_adapter
    from exsr.train.controller import GANController
    from exsr.train.checkpoints import CheckpointManager
    from exsr.data.datasets import JPEGDataset, DataLoader

    latent_channels = (int(args.latent_channels)
                       if args.latent_channels.isdigit()
                       else args.latent_channels)
    cfg = DecompConfig(patch_size=args.patch,
                       latent_channels=latent_channels, niter=args.niter)
    hb = args.patch // 8
    gcfg = DnCNNConfig(n_channels=args.nf, depth=args.nb,
                       num_latent_channels=cfg.num_latent_channels)
    g = DnCNN(gcfg)
    d = DnCNNDiscriminator(n_channels=args.nf, depth=args.nb,
                           expected_input_size=hb, norm='layer')
    coeffs0 = jnp.zeros((1, hb, hb, 64))
    z0 = jnp.zeros((1, hb, hb, cfg.num_latent_channels))
    g_vars = dict(g.init(jax.random.PRNGKey(args.seed), coeffs0, z0))
    d_vars = dict(d.init(jax.random.PRNGKey(args.seed + 1), coeffs0))

    def g_apply(params, coeffs, z):
        if 'batch_stats' in params:
            out, _ = g.apply(params, coeffs, z, train=True,
                             mutable=['batch_stats'])
            return out
        return g.apply(params, coeffs, z)

    def g_stats_apply(params, coeffs, z):
        # loss forward that ALSO returns the mutated BN running stats —
        # the torch reference updates them on every train-mode forward;
        # dropping them leaves eval-mode inference on init stats
        out, mut = g.apply(params, coeffs, z, train=True,
                           mutable=['batch_stats'])
        return out, mut['batch_stats']

    # batch-sharded data parallelism over available devices (the
    # reference DataParallel-wraps the DnCNN nets too, networks.py:157-181)
    rules = _make_rules(args.batch)
    trainer = DecompTrainer(
        cfg, g_apply, flax_d_adapter(d),
        g_stats_apply=g_stats_apply if 'batch_stats' in g_vars else None,
        rules=rules)

    # validation measures the DEPLOYED semantics: eval-mode BN (running
    # stats), exactly what eval_jpeg / sessions run after export
    decode_eval = jax.jit(lambda p, c, z, qf: trainer.codec.extract(
        g.apply(p, c, z, train=False), qf))
    state = trainer.init_state(g_vars, d_vars,
                               jax.random.PRNGKey(args.seed + 2))
    ctl = GANController(d_update_ratio=10, d_valid_steps_4_g=10,
                        d_verification=args.d_verification,
                        min_mean_d_correct=args.min_d_correct)
    os.makedirs(args.exp_dir, exist_ok=True)
    from exsr.utils.misc import (stage_scalars, read_scalars,
                                 install_sigint_stop)
    from exsr.utils.logging import MetricLog
    mlog = MetricLog()
    log_path = os.path.join(args.exp_dir, 'logs.npz')
    ckpts = CheckpointManager(os.path.abspath(
        os.path.join(args.exp_dir, 'ckpt')), max_to_keep=3,
        save_interval_steps=args.ckpt_freq)
    if args.resume and ckpts.latest_step() is not None:
        state, ctl_state = ckpts.restore(state, with_controller=True)
        # sync the host-side controller with the restored device state —
        # without this a resumed run restarts the whole schedule at
        # ctl.step 0 (and the first mlog.save would truncate logs.npz)
        ctl.step = int(state.step)
        if ctl_state:
            ctl.step = ctl_state['step']
            ctl.generator_started_learning = \
                ctl_state['generator_started_learning']
            ctl.verified_d_saved = ctl_state['verified_d_saved']
            ctl.d_verified = bool(ctl_state.get('d_verified', False))
        if os.path.exists(log_path):
            mlog.load(log_path, max_step=ctl.step)
        print('resumed at step', ctl.step)

    ds = JPEGDataset(root=args.data_dir, patch_size=args.patch,
                     qf_spec=(((args.qf_min, args.qf_max), 1.0),),
                     train=True)
    loader = DataLoader(ds, batch_size=args.batch, seed=args.seed)

    val_ds = None
    if args.val_dir:
        val_ds = JPEGDataset(root=args.val_dir, patch_size=args.patch,
                             qf_spec=(((args.qf_min, args.qf_max), 1.0),),
                             train=False)

    def validate(state):
        """Reference validation recipe (train_JPEG.py:123-152): decode
        each val patch at Z in {0, -0.5, 0.5}, report mean Y-PSNR over the
        sweep and per-pixel STD across the Z samples (diversity)."""
        from exsr.utils.metrics import calculate_psnr
        z_vals = ([0.0, -0.5, 0.5]
                  if cfg.num_latent_channels else [0.0])
        psnrs, stds = [], []
        for i in range(min(len(val_ds), 8)):
            item = val_ds[i]
            uncomp = jnp.asarray(item['uncomp'][None])
            qf = jnp.asarray([float(item['qf'])])
            comp = trainer.codec.compress(uncomp, qf, quantize=True)
            hb_, wb_ = comp.shape[1:3]
            outs = []
            for zv in z_vals:
                z = jnp.full((1, hb_, wb_, cfg.num_latent_channels), zv)
                out = np.asarray(jnp.clip(
                    decode_eval(state.g_params, comp, z, qf), 0, 255))
                outs.append(out[0, :, :, 0])
                psnrs.append(calculate_psnr(
                    out[0, :, :, 0], np.asarray(uncomp)[0, :, :, 0]))
            if len(outs) > 1:
                stds.append(float(np.std(np.stack(outs), 0).mean()))
        rec = {'step': ctl.step,
               'psnr_val': round(float(np.mean(psnrs)), 4)}
        if stds:
            rec['per_pix_STD_val'] = round(float(np.mean(stds)), 5)
        print(json.dumps(rec))
        mlog.append(ctl.step, **{k: v for k, v in rec.items()
                                 if k != 'step'})
    def _ctl_snapshot():
        return {'step': ctl.step,
                'generator_started_learning':
                    ctl.generator_started_learning,
                'verified_d_saved': ctl.verified_d_saved,
                # the initial/initial_gradual gate is sticky once
                # verified — it must survive resume
                'd_verified': ctl.d_verified}

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

    # a deadline SIGINT must not cost the last checkpoint interval: the
    # r5c run lost its entire 50-step state this way (KeyboardInterrupt
    # skipped the forced final save; only step 1 survived).  The handler
    # turns the first SIGINT into a clean stop at the next loop top; a
    # second SIGINT falls back to the default (hard) behavior.
    stop_requested = install_sigint_stop()

    # cross-epoch prefetch stream (see train_sr/DataLoader.stream): tiny tile
    # datasets make an epoch a single batch, which defeats per-epoch prefetch
    for batch in loader.stream(0):
        if ctl.step >= cfg.niter or stop_requested():
            break
        b = rules.shard_host_batch({'uncomp': batch['uncomp'],
                                    'qf': batch['qf']})
        dual = (cfg.optimal_z_weight is not None
                and ctl.generator_started_learning)
        d_staged = g_staged = None
        if ctl.want_d_step():
            state, dm = trainer.d_step(state, b, dual=dual)
            d_staged = stage_scalars(dm)
        if ctl.want_g_step():
            state, gm = trainer.g_step(state, b, dual=dual,
                                       use_gan=True)
            g_staged = stage_scalars(gm)
        # pipelined metric recording (see train_sr): step t+1 is
        # enqueued before step t's one-transfer fetch materializes,
        # overlapping the tunnel round-trip with device compute;
        # gating sees records one step staler
        apply_pending()
        pending = (d_staged, g_staged)
        state = trainer.advance(state)
        ctl.tick()
        if ctl.step % args.print_freq == 0:
            rate = args.print_freq / max(time.time() - t0, 1e-9)
            t0 = time.time()
            print(json.dumps({'step': ctl.step,
                              'steps_per_s': round(rate, 3)}))
            mlog.append(ctl.step, **log_accum)
            mlog.save(log_path)
        if val_ds is not None and ctl.step % args.val_freq == 0:
            validate(state)
        ckpts.save(ctl.step, state, controller_state=_ctl_snapshot())
    stop_requested.restore()
    apply_pending()
    pending = (None, None)
    ckpts.save(ctl.step, state, controller_state=_ctl_snapshot(),
               force=True)
    ckpts.wait()
    mlog.save(log_path)
    mlog.dashboard(os.path.join(args.exp_dir, 'dashboards'))
    print('JPEG training done at step', ctl.step)


def _main_chroma(args):
    """Chroma phase: train the 2x64 low-freq chroma generator conditioned
    on the (frozen) Y generator with mixed real/fake Y for the critic —
    train_JPEG.py ModelChroma variant, DecompCNN_model.py:379-383,
    711-729."""
    import jax
    import jax.numpy as jnp
    from exsr.models.dncnn import DnCNN, DnCNNConfig, DnCNNDiscriminator
    from exsr.train.decomp import DecompConfig
    from exsr.train.decomp_chroma import ChromaDecompTrainer
    from exsr.train.srragan import flax_d_adapter
    from exsr.train.checkpoints import CheckpointManager
    from exsr.data.datasets import JPEGDataset, DataLoader
    from exsr.utils.logging import MetricLog
    from exsr.utils.metrics import calculate_psnr

    cfg = DecompConfig(patch_size=args.patch, latent_channels=0,
                       chroma_mode=True, niter=args.niter)
    ylat = args.y_latent_channels
    gy = DnCNN(DnCNNConfig(n_channels=args.y_nf or args.nf,
                           depth=args.y_nb or args.nb,
                           num_latent_channels=ylat))
    gy_vars = dict(gy.init(jax.random.PRNGKey(args.seed + 7),
                           jnp.zeros((1, 8, 8, 64)),
                           jnp.zeros((1, 8, 8, ylat)) if ylat else None))
    if args.y_ckpt:
        from exsr.models.convert import align_params_to
        mgr_y = CheckpointManager(os.path.abspath(args.y_ckpt))
        raw = mgr_y.restore_raw(mgr_y.latest_step())
        gy_vars = jax.tree.map(jnp.asarray,
                               align_params_to(gy_vars, raw['g_params']))
        print(f'conditioning on Y generator from {args.y_ckpt}')
    else:
        print('no --y_ckpt: conditioning on RANDOM Y weights '
              '(pipeline checks only)')

    def gy_apply(coeffs, _z):
        z = jnp.zeros(coeffs.shape[:3] + (ylat,)) if ylat else None
        if 'batch_stats' in gy_vars:
            out, _ = gy.apply(gy_vars, coeffs, z, train=False,
                              mutable=['batch_stats'])
            return out
        return gy.apply(gy_vars, coeffs, z)

    gc = DnCNN(DnCNNConfig(n_channels=args.nf, depth=args.nb,
                           in_nc=256 + 128, out_nc=2 * 64,
                           chroma_generator=True, block_size=8,
                           num_latent_channels=0))
    hb16 = args.patch // 16
    packed0 = jnp.zeros((1, hb16, hb16, 256 + 128))
    gc_vars = dict(gc.init(jax.random.PRNGKey(args.seed), packed0, None))
    d = DnCNNDiscriminator(n_channels=args.nf, depth=args.nb,
                           expected_input_size=hb16, norm='layer')
    d_vars = dict(d.init(jax.random.PRNGKey(args.seed + 1), packed0))

    def gc_apply(params, packed, _z):
        if 'batch_stats' in params:
            out, _ = gc.apply(params, packed, None, train=True,
                              mutable=['batch_stats'])
            return out
        return gc.apply(params, packed, None)

    def gc_stats_apply(params, packed, _z):
        out, mut = gc.apply(params, packed, None, train=True,
                            mutable=['batch_stats'])
        return out, mut['batch_stats']

    rules = _make_rules(args.batch)
    trainer = ChromaDecompTrainer(
        cfg, gy_apply, gc_apply, flax_d_adapter(d),
        g_stats_apply=gc_stats_apply if 'batch_stats' in gc_vars
        else None, rules=rules)
    state = trainer.init_state(gc_vars, d_vars,
                               jax.random.PRNGKey(args.seed + 2))
    os.makedirs(args.exp_dir, exist_ok=True)
    mlog = MetricLog()
    log_path = os.path.join(args.exp_dir, 'logs.npz')
    ckpts = CheckpointManager(os.path.abspath(
        os.path.join(args.exp_dir, 'ckpt')), max_to_keep=3,
        save_interval_steps=args.ckpt_freq)
    step = 0
    if args.resume and ckpts.latest_step() is not None:
        state = ckpts.restore(state)
        step = int(state.step)
        if os.path.exists(log_path):
            mlog.load(log_path, max_step=step)
        print('resumed at step', step)

    ds = JPEGDataset(root=args.data_dir, patch_size=args.patch,
                     chroma=True,
                     qf_spec=(((args.qf_min, args.qf_max), 1.0),),
                     train=True)
    loader = DataLoader(ds, batch_size=args.batch, seed=args.seed)
    val_ds = None
    if args.val_dir:
        val_ds = JPEGDataset(root=args.val_dir, patch_size=args.patch,
                             chroma=True,
                             qf_spec=(((args.qf_min, args.qf_max), 1.0),),
                             train=False)
    decode = trainer.decode   # already jitted by the trainer

    def validate():
        """CbCr PSNR of the chroma decode (conditioned on the Y
        generator's output, mix off) vs the uncompressed chroma."""
        psnrs = []
        for i in range(min(len(val_ds), 8)):
            item = val_ds[i]
            ycbcr = jnp.asarray(item['uncomp'][None])
            qf = jnp.asarray([float(item['qf'])])
            y_cond, _ = trainer._fake_y(ycbcr[..., :1], qf,
                                        jax.random.PRNGKey(0), mix=False)
            packed, _, _ = trainer._chroma_inputs(ycbcr, y_cond, qf)
            chroma = np.asarray(jnp.clip(
                decode(state.gc_params, packed, qf), 0, 255))
            psnrs.append(calculate_psnr(
                chroma[0], np.asarray(ycbcr)[0, :, :, 1:]))
        rec = {'step': step,
               'psnr_chroma_val': round(float(np.mean(psnrs)), 4)}
        print(json.dumps(rec))
        mlog.append(step, psnr_chroma_val=rec['psnr_chroma_val'])

    from exsr.utils.misc import fetch_scalars as _fs
    t0 = time.time()
    log_accum = {}
    for batch in loader.stream(0):
        if step >= cfg.niter:
            break
        b = rules.shard_host_batch({'uncomp': batch['uncomp'],
                                    'qf': batch['qf']})
        state, metrics = trainer.step_fn(state, b, use_gan=True)
        log_accum.update({k: v for k, v in _fs(metrics).items()
                          if np.ndim(v) == 0})
        step = int(state.step)
        if step % args.print_freq == 0:
            rate = args.print_freq / max(time.time() - t0, 1e-9)
            t0 = time.time()
            print(json.dumps({'step': step,
                              'steps_per_s': round(rate, 3),
                              **{k: round(v, 5)
                                 for k, v in log_accum.items()}}))
            mlog.append(step, **log_accum)
            mlog.save(log_path)
        if val_ds is not None and step % args.val_freq == 0:
            validate()
        ckpts.save(step, state)
    ckpts.save(step, state, force=True)
    ckpts.wait()
    mlog.save(log_path)
    mlog.dashboard(os.path.join(args.exp_dir, 'dashboards'))
    print('chroma training done at step', step)


if __name__ == '__main__':
    main()
