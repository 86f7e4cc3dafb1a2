"""Real multi-process (multi-host) data parallelism: two JAX processes on
the CPU backend (2 virtual devices each → a 4-device global mesh, Gloo
collectives), disjoint ``DataFolder(num_shards, shard_index)`` input shards,
one cross-process gradient-psum step — compared against the identical
single-process 4-device step (SURVEY.md §2.6, VERDICT r3 item 8)."""

import json
import os
import pickle
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tiny_model_setup, tmp_path):
    st = tiny_model_setup
    from ggpm_tpu.parallel.mesh import make_mesh
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    # single-process reference trainer (also used to signature-check)
    mesh = make_mesh(4)
    opt = make_optimizer(lr=2e-3, anneal_rate=0.98, steps_per_epoch=3)
    tr = Trainer(st['model'], opt, st['vocab'].mask, beta=0.01,
                 print_iter=10 ** 9, mesh=mesh, seed=1)

    # 4 global batches, all same post-conversion signature so both workers
    # (and the reference) take exactly one stacked dp_step
    b0, b1 = st['batches'][0], st['batches'][1]

    def sig(b):
        return tuple(np.asarray(x).shape
                     for x in jax.tree.leaves(tr._device_batch(b)))
    if sig(b0) != sig(b1):
        b1 = b0
    global_order = [b0, b1, b0, b1]   # shard0: (b0,b1), shard1: (b0,b1)

    workdir = tmp_path / 'mh'
    shards = workdir / 'shards'
    shards.mkdir(parents=True)
    # DataFolder reads sorted files; files[pid::2] → pid0 gets tensors-0,
    # pid1 gets tensors-1
    with open(shards / 'tensors-0.pkl', 'wb') as f:
        pickle.dump(global_order[:2], f)
    with open(shards / 'tensors-1.pkl', 'wb') as f:
        pickle.dump(global_order[2:], f)
    with open(workdir / 'setup.pkl', 'wb') as f:
        pickle.dump({'cfg': st['cfg'],
                     'vocab_mask': np.asarray(st['vocab'].mask),
                     'init_batch': b0}, f)

    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=2')
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), '2', str(port), str(workdir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = {}
    for pid in (0, 1):
        with open(workdir / f'result_{pid}.json') as f:
            results[pid] = json.load(f)

    # disjoint input shards covering the whole folder
    assert results[0]['files'] == ['tensors-0.pkl']
    assert results[1]['files'] == ['tensors-1.pkl']
    assert results[0]['n_global_devices'] == 4

    # the collective makes both processes agree exactly
    assert results[0]['loss'] == pytest.approx(results[1]['loss'], rel=1e-6)
    assert results[0]['checksum'] == pytest.approx(results[1]['checksum'],
                                                   rel=1e-6)

    # single-process reference: same 4 batches on a 4-device mesh, same
    # seed/rng chain → same loss and post-step params up to psum order
    params, opt_state = tr.init(b0)
    local = [tr._device_batch(b) for b in global_order]
    params, _, metrics, _ = tr.dp_step(params, opt_state, local)
    checksum = float(sum(np.abs(np.asarray(jax.device_get(x))).sum()
                         for x in jax.tree.leaves(params)))
    assert results[0]['loss'] == pytest.approx(float(metrics['Loss']),
                                               rel=1e-4)
    assert results[0]['checksum'] == pytest.approx(checksum, rel=1e-4)
