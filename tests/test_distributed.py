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
