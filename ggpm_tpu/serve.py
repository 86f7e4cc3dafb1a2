"""Minimal production serving layer: HTTP JSON API over a loaded model.

The reference has no serving story (research scripts only); this module
rounds the framework out for deployment: a threaded stdlib HTTP server
exposing encode / reconstruct / sample / optimize endpoints on a resident
model with compiled decode kernels.

    server = GgpmServer(model, params, vocab)
    server.start(port=8000)

    POST /encode       {"smiles": [...]}                  → latents
    POST /reconstruct  {"smiles": [...]}                  → decoded SMILES
    POST /sample       {"n": 8, "seed": 0}                → sampled SMILES
    POST /optimize     {"smiles": [...], "homo": [...],
                        "lumo": [...], "policy": "hard"}  → optimized SMILES
    POST /properties   {"smiles": [...]}                  → HOMO/LUMO preds
    GET  /health                                          → status
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.batching import to_model_batch
from .graph.mol_graph import tensorize
from .graph.vocab import PairVocab, common_atom_vocab
from .models.api import encode as _encode
from .models.decode import decode_best, sample_prior


class GgpmServer:
    def __init__(self, model, params, vocab: PairVocab,
                 avocab=common_atom_vocab, max_decode_step: int = 150):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.avocab = avocab
        self.max_decode_step = max_decode_step
        self.is_hier = type(model).__name__.startswith('Hier')
        self.decode_fn = decode_best
        self.lock = threading.Lock()   # decode kernels share device buffers
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- operations --------------------------------------------------------
    def _encode_smiles(self, smiles_list):
        mb = tensorize([[s, None, None] for s in smiles_list],
                       self.vocab, self.avocab)
        batch = jax.tree.map(jnp.asarray,
                             to_model_batch(mb, self.vocab.mask, pad=False))
        z, _ = _encode(self.model, self.params, batch, perturb=False)
        return np.asarray(z)

    def encode(self, smiles_list):
        return {'latents': self._encode_smiles(smiles_list).tolist()}

    def reconstruct(self, smiles_list):
        z = self._encode_smiles(smiles_list)
        _, out = self.decode_fn(self.model, self.params, self.vocab,
                                self.avocab, z, greedy=True,
                                max_decode_step=self.max_decode_step,
                                log_steps=False)
        return {'smiles': out}

    def sample(self, n: int, seed: int = 0):
        _, out = sample_prior(self.model, self.params, self.vocab,
                              self.avocab, n,
                              rng=np.random.default_rng(seed),
                              max_decode_step=self.max_decode_step,
                              log_steps=False)
        return {'smiles': out}

    def properties(self, smiles_list):
        z = self._encode_smiles(smiles_list)
        h, l = self.model.apply(self.params, jnp.asarray(z),
                                method=lambda m, zz: m.predict_properties(zz))
        return {'homo': np.asarray(h).tolist(), 'lumo': np.asarray(l).tolist()}

    def optimize(self, smiles_list, homo, lumo, policy: str = 'hard',
                 **opt_kwargs):
        from .latent.control import LatentOptimizer
        z = self._encode_smiles(smiles_list)
        opt = LatentOptimizer(self.model, self.params, optimize_type=policy,
                              **opt_kwargs)
        z_opt = opt.optimize(jnp.asarray(z), np.asarray(homo, dtype=np.float32),
                             np.asarray(lumo, dtype=np.float32))
        h, l = self.model.apply(self.params, z_opt,
                                method=lambda m, zz: m.predict_properties(zz))
        _, out = self.decode_fn(self.model, self.params, self.vocab,
                                self.avocab, np.asarray(z_opt), greedy=True,
                                max_decode_step=self.max_decode_step,
                                log_steps=False)
        return {'smiles': out, 'homo': np.asarray(h).tolist(),
                'lumo': np.asarray(l).tolist()}

    # -- http --------------------------------------------------------------
    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _reply(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == '/health':
                    self._reply(200, {'status': 'ok',
                                      'model': type(server.model).__name__,
                                      'vocab': list(server.vocab.size())})
                else:
                    self._reply(404, {'error': 'not found'})

            def do_POST(self):
                try:
                    n = int(self.headers.get('Content-Length', 0))
                    req = json.loads(self.rfile.read(n) or b'{}')
                    with server.lock:
                        if self.path == '/encode':
                            out = server.encode(req['smiles'])
                        elif self.path == '/reconstruct':
                            out = server.reconstruct(req['smiles'])
                        elif self.path == '/sample':
                            out = server.sample(int(req.get('n', 8)),
                                                int(req.get('seed', 0)))
                        elif self.path == '/properties':
                            out = server.properties(req['smiles'])
                        elif self.path == '/optimize':
                            out = server.optimize(
                                req['smiles'], req['homo'], req['lumo'],
                                req.get('policy', 'hard'))
                        else:
                            self._reply(404, {'error': 'not found'})
                            return
                    self._reply(200, out)
                except Exception as e:
                    self._reply(500, {'error': str(e)})

        return Handler

    def start(self, port: int = 8000, block: bool = False):
        self._httpd = ThreadingHTTPServer(('0.0.0.0', port), self._handler())
        if block:
            self._httpd.serve_forever()
        else:
            t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t.start()
        return self._httpd

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
