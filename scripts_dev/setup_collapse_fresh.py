"""Stage the collapse-guard LIVE-FIRE from a FRESH warmup run (r5 session 3).

Both prior stagings were destroyed by VM resets (the r4 diverged
checkpoint graveyard, then the r5 flagship final checkpoint), so the
provocation is re-created from scratch at the r4 divergence's own width
(run50k2: nb=8 nf=32, patch 128, wgan-gp) and its actual D (patch head,
num_2_strides=2) — the exact regime whose recorded symmetric runaway the
reference D-loss-STD detector (SRRaGAN_model.py:592-632 semantics) is
provably blind to:

  stage warm  -> experiments/collapse_warm_r5/opt.json  (lr_D 1e-5)
  stage fork  -> experiments/collapse_fire_r5/          (copy of the
                 warmup exp dir with lr_D jumped 100x to 1e-3 — more
                 violent than the r4 organic 10x jump because the fork
                 critic is younger and the live-fire window is minutes,
                 not the 3k steps the r4 divergence took to develop),
                 fork_step.txt + staged_from.txt for the assembler.
"""
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WARM = os.path.join(ROOT, 'experiments/collapse_warm_r5')
FIRE = os.path.join(ROOT, 'experiments/collapse_fire_r5')

OPT = r'''{
  "name": "collapse_warm_r5"
  , "model": "srragan"
  , "scale": 4
  , "range": [0,1]
  , "datasets": { "train": {
      "mode": "LRHR", "dataroot_HR": "experiments/data/train",
      "dataroot_LR": null,
      "batch_size_per_GPU": 16, "batch_size_4_grads_G": 16,
      "batch_size_4_grads_D": 16, "patch_size": 128,
      "use_flip": true, "use_rot": true, "n_workers": 2 } }
  , "path": { "root": "experiments/collapse_warm_r5", "datasets": "experiments/data" }
  , "network_G": { "which_model_G": "RRDB_net", "CEM_arch": 1,
      "sigmoid_range_limit": 0, "latent_input": "all_layers",
      "latent_input_domain": "HR_downscaled",
      "latent_channels": "SVDinNormedOut_structure_tensor",
      "nf": 32, "nb": 8, "in_nc": 3, "out_nc": 3, "gc": 32 }
  , "network_D": { "which_model_D": "discriminator_vgg_128",
      "relativistic": 0, "norm_type": "batch", "n_layers": 10,
      "num_2_strides": 2, "nf": 64, "in_nc": 3 }
  , "train": { "resume": 0, "lr_G": 1e-5, "lr_D": 1e-5,
      "lr_steps": [50000, 100000, 200000, 300000], "lr_gamma": 0.5,
      "gan_type": "wgan-gp", "gan_weight": 1, "latent_weight": 1,
      "optimalZ_loss_type": "l1", "optimalZ_loss_weight": 100,
      "range_weight": 5000, "gp_weight": 10, "D_update_ratio": 10,
      "D_valid_Steps_4_G_update": 10, "min_D_prob_ratio_4_G": 1.05,
      "min_mean_D_correct": 0.9, "D_verification": "past",
      "steps_4_loss_std": 500, "std_4_lr_drop": 1.6, "niter": 2000 }
}
'''


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else 'warm'
    if stage == 'warm':
        os.makedirs(WARM, exist_ok=True)
        with open(os.path.join(WARM, 'opt.json'), 'w') as f:
            f.write(OPT)
        print('staged', WARM)
        return
    assert stage == 'fork'
    if os.path.exists(FIRE):
        shutil.rmtree(FIRE)
    shutil.copytree(WARM, FIRE)
    opt = open(os.path.join(FIRE, 'opt.json')).read()
    opt = opt.replace('"name": "collapse_warm_r5"',
                      '"name": "collapse_fire_r5"')
    opt = opt.replace('"root": "experiments/collapse_warm_r5"',
                      '"root": "experiments/collapse_fire_r5"')
    opt = opt.replace('"lr_D": 1e-5', '"lr_D": 1e-3')
    with open(os.path.join(FIRE, 'opt.json'), 'w') as f:
        f.write(opt)
    # fork step = latest warmup checkpoint
    ck = os.path.join(FIRE, 'ckpt')
    steps = sorted(int(d) for d in os.listdir(ck) if d.isdigit())
    with open(os.path.join(FIRE, 'fork_step.txt'), 'w') as f:
        f.write(str(steps[-1]))
    with open(os.path.join(FIRE, 'staged_from.txt'), 'w') as f:
        f.write(
            'fresh collapse_warm_r5 warmup ckpt step %d (nb=8 nf=32, '
            'patch-head D num_2_strides=2 — the r4 diverged run\'s own '
            'width and D architecture), lr_D jumped 100x 1e-5 -> 1e-3; '
            'both prior stagings (r4 diverged ckpt, r5 flagship final '
            'ckpt) were destroyed by VM resets' % steps[-1])
    print('staged', FIRE, 'fork at', steps[-1])


if __name__ == '__main__':
    main()
