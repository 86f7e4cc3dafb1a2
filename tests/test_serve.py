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
