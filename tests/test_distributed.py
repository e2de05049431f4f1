"""Multi-host bring-up path: 2 real processes + a coordinator.

The SURVEY (section 2.16) names multi-host DCN support via
``jax.distributed.initialize`` as part of the parallelism spec;
``exsr.parallel.mesh.initialize_distributed`` wires it.  This test proves
the bring-up actually handshakes: two local CPU processes join one
coordinator, build a mesh spanning both processes' devices, assemble a
globally-sharded array from process-local shards, and run a jitted
cross-process reduction with the right answer in both processes.
"""
import os
import socket

import pytest
import subprocess
import sys


_WORKER = r"""
import sys
process_id = int(sys.argv[1])
port = sys.argv[2]

import jax
jax.config.update('jax_platforms', 'cpu')
from exsr.parallel.mesh import (initialize_distributed, local_batch_slice,
                                make_mesh)
initialize_distributed(coordinator_address=f'localhost:{port}',
                       num_processes=2, process_id=process_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == process_id

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

n_local = len(jax.local_devices())
n_global = len(jax.devices())
assert n_global == 2 * n_local, (n_global, n_local)

mesh = make_mesh(data=n_global, spatial=1)
sharding = NamedSharding(mesh, P('data', None))

# host-parallel input pipeline: each process holds only its slice of the
# global batch (the local_batch_slice contract)
global_batch = np.arange(4 * n_global, dtype=np.float32).reshape(n_global, 4)
sl = local_batch_slice(n_global)
assert sl == slice(process_id * n_local, (process_id + 1) * n_local)
arr = jax.make_array_from_process_local_data(sharding, global_batch[sl])
assert arr.shape == (n_global, 4)

total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(arr)
expect = float(global_batch.sum())
got = float(total)
assert abs(got - expect) < 1e-5, (got, expect)
print(f'proc{process_id}: OK sum={got}', flush=True)
"""


def test_two_process_distributed_bringup(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=2').strip()
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, str(i), str(port)],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{i} failed:\n{out}'
        assert f'proc{i}: OK' in out, out


_TRAIN_WORKER = r"""
import sys
process_id = int(sys.argv[1])
port = sys.argv[2]

import jax
jax.config.update('jax_platforms', 'cpu')
from exsr.parallel.mesh import (initialize_distributed, local_batch_slice,
                                make_mesh, ShardingRules)
initialize_distributed(coordinator_address=f'localhost:{port}',
                       num_processes=2, process_id=process_id)

import numpy as np
import jax.numpy as jnp
from exsr.cem.cem import CEM, CEMConf, cem_wrap
from exsr.models.rrdb import RRDBNet
from exsr.models.discriminators import DiscriminatorVGG128
from exsr.train.srragan import SRRaGANTrainer, TrainConfig, flax_d_adapter

n_global = len(jax.devices())
cem = CEM.create(CEMConf(scale_factor=4))
filt = cem.device_filters(3)
g = RRDBNet(nb=1, nf=8, gc=4, latent_channels=3)
patch = 4 * (2 * cem.invalidity_margins_lr + 8)
lr_size = patch // 4
d_input = patch - 2 * cem.invalidity_margins_hr
d = DiscriminatorVGG128(base_nf=8, nb=4, num_2_strides=1,
                        input_patch_size=d_input)
g_params = g.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, lr_size, lr_size, 3)),
                  jnp.zeros((1, patch, patch, 3)))
d_vars = dict(d.init(jax.random.PRNGKey(1),
                     jnp.zeros((1, d_input, d_input, 3))))
wrapped = cem_wrap(lambda p, x, z: g.apply(p, x, z), filt, upscale=4)
g_apply = lambda p, x, z: wrapped(p, x, z, 0, pre_pad=False)
cfg = TrainConfig(optimal_z_iters=1, optimal_z_weight=None,
                  steps_4_loss_std=5)
mesh = make_mesh(data=n_global, spatial=1)
rules = ShardingRules(mesh)
trainer = SRRaGANTrainer(cfg, g_apply, flax_d_adapter(d),
                         margins_hr=cem.invalidity_margins_hr, rules=rules)
state = trainer.init_state(g_params, d_vars, jax.random.PRNGKey(2))

# host-parallel input: every process materializes only its slice of the
# global batch; shard_host_batch assembles the global arrays
rng = np.random.default_rng(0)   # same seed -> same notional global batch
B = n_global
gb = {'lr': rng.uniform(size=(B, lr_size, lr_size, 3)).astype(np.float32),
      'hr': rng.uniform(size=(B, patch, patch, 3)).astype(np.float32)}
sl = local_batch_slice(B)
batch = rules.shard_host_batch({k: v[sl] for k, v in gb.items()})
assert batch['lr'].shape[0] == B   # global shape, process-local shards

# per-sample 1D leaves (e.g. the JPEG loader's [B] 'qf') assemble to the
# true global array, not a replicated per-host slice
qf_global = np.arange(B, dtype=np.float32) + 3.0
extra = rules.shard_host_batch({'qf': qf_global[sl]})
assert extra['qf'].shape == (B,)
from jax.sharding import NamedSharding, PartitionSpec as P
qsum = jax.jit(lambda q: q.sum(),
               out_shardings=NamedSharding(mesh, P()))(extra['qf'])
assert abs(float(qsum) - float(qf_global.sum())) < 1e-5

state, metrics = trainer.d_step(state, batch, dual=False)
l = float(metrics['l_d_total'])
assert np.isfinite(l), l
print(f'proc{process_id}: TRAIN_OK l_d={l:.5f}', flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    """One D train step over a mesh spanning 2 processes, with the batch
    assembled from per-host slices (SURVEY 2.16: host-parallel input +
    DCN-style multi-host training)."""
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=2').strip()
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    procs = [subprocess.Popen(
        [sys.executable, '-c', _TRAIN_WORKER, str(i), str(port)],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{i} failed:\n{out[-4000:]}'
        assert f'proc{i}: TRAIN_OK' in out, out[-2000:]
        losses.append(float(out.split('l_d=')[1].split()[0]))
    # both processes agree on the replicated loss
    assert abs(losses[0] - losses[1]) < 1e-5
