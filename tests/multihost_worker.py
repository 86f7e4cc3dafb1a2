"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Not collected by pytest (no ``test_`` prefix).  Each worker joins the
cluster, reads its DISJOINT DataFolder shard, runs ONE data-parallel
optimizer step over the global 4-device mesh (gradient psum spans both
processes via Gloo), and writes its loss/param-checksum for the parent to
compare against a single-process run of the same global batch order.
"""

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(f'localhost:{port}', num_processes=nprocs,
                               process_id=pid)

    import numpy as np

    from ggpm_tpu.data.dataset import DataFolder
    from ggpm_tpu.models.vae import PropertyVAE
    from ggpm_tpu.parallel.distributed import make_global_mesh
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    with open(os.path.join(workdir, 'setup.pkl'), 'rb') as f:
        setup = pickle.load(f)

    assert jax.process_count() == nprocs
    mesh = make_global_mesh()
    model = PropertyVAE(cfg=setup['cfg'])
    opt = make_optimizer(lr=2e-3, anneal_rate=0.98, steps_per_epoch=3)
    tr = Trainer(model, opt, setup['vocab_mask'], beta=0.01,
                 print_iter=10 ** 9, mesh=mesh, seed=1)
    params, opt_state = tr.init(setup['init_batch'])

    df = DataFolder(os.path.join(workdir, 'shards'), 8, shuffle=False,
                    num_shards=nprocs, shard_index=pid)
    local = [tr._device_batch(b) for b in df]
    assert len(local) == tr.n_shards, (len(local), tr.n_shards)

    params, opt_state, metrics, aux = tr.dp_step(params, opt_state, local)
    checksum = float(sum(np.abs(np.asarray(jax.device_get(x))).sum()
                         for x in jax.tree.leaves(params)))
    out = {'pid': pid, 'loss': float(metrics['Loss']),
           'files': list(df.data_files), 'checksum': checksum,
           'n_global_devices': len(jax.devices())}
    with open(os.path.join(workdir, f'result_{pid}.json'), 'w') as f:
        json.dump(out, f)


if __name__ == '__main__':
    main()
