"""Serving-layer tests: HTTP API over a resident model."""

import json
import urllib.request

import numpy as np


def _post(port, path, payload):
    req = urllib.request.Request(
        f'http://127.0.0.1:{port}{path}',
        data=json.dumps(payload).encode(),
        headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_server_endpoints(tiny_model_setup):
    from ggpm_tpu.serve import GgpmServer
    st = tiny_model_setup
    server = GgpmServer(st['model'], st['params'], st['vocab'],
                        max_decode_step=25)
    httpd = server.start(port=18321)
    try:
        with urllib.request.urlopen('http://127.0.0.1:18321/health',
                                    timeout=30) as r:
            health = json.loads(r.read())
        assert health['status'] == 'ok'

        smiles = st['batches'][0].smiles[:3]
        enc = _post(18321, '/encode', {'smiles': smiles})
        assert np.asarray(enc['latents']).shape == (3, st['cfg'].latent_size)

        rec = _post(18321, '/reconstruct', {'smiles': smiles})
        assert len(rec['smiles']) == 3

        samp = _post(18321, '/sample', {'n': 2, 'seed': 1})
        assert len(samp['smiles']) == 2
    finally:
        server.stop()


def test_server_properties_and_optimize(tiny_model_setup):
    import jax
    import jax.numpy as jnp
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.models.vae import PropOptVAE
    from ggpm_tpu.serve import GgpmServer
    st = tiny_model_setup
    batch = jax.tree.map(jnp.asarray, to_model_batch(
        st['batches'][0], st['vocab'].mask, pad=False))
    model = PropOptVAE(cfg=st['cfg'])
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng,
                        True, True)
    server = GgpmServer(model, params, st['vocab'], max_decode_step=20)
    server.start(port=18322)
    try:
        smiles = st['batches'][0].smiles[:2]
        props = _post(18322, '/properties', {'smiles': smiles})
        assert len(props['homo']) == 2 and len(props['lumo']) == 2
        out = _post(18322, '/optimize',
                    {'smiles': smiles, 'homo': [-5.0, -5.0],
                     'lumo': [1.0, 1.0], 'policy': 'hard'})
        assert len(out['smiles']) == 2 and len(out['homo']) == 2
    finally:
        server.stop()
