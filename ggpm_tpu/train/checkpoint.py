"""Checkpoint save/load and cross-model weight transfer.

Replaces ``torch.save(model.state_dict())`` / ``copy_model`` /
``copy_encoder`` (reference /root/reference/vae_train.py:101-111,
/root/reference/ggpm/nnutils.py:13-62) with msgpack param-tree files plus
shape-filtered pytree merging, so pretrain→fine-tune transfer between model
classes works the same way (only matching names with matching shapes copy).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util


def save_params(params, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(template, path: str):
    with open(path, 'rb') as f:
        return serialization.from_bytes(template, f.read())


def save_state(state: Dict[str, Any], path: str) -> None:
    """Save a full train state (params + opt state + step)."""
    save_params(state, path)


def load_state(template: Dict[str, Any], path: str):
    return load_params(template, path)


def _flat(params):
    return traverse_util.flatten_dict(serialization.to_state_dict(params))


def copy_matching(target_params, source_params, prefix_map: Optional[Dict[str, str]] = None):
    """Copy source leaves into the target wherever the (possibly remapped)
    path exists with the same shape — the reference's shape-filtered
    state_dict transfer (nnutils.py:13-62).

    ``prefix_map`` maps target path prefixes to source prefixes, enabling
    e.g. encoder-only transfer or cross-class transfer where one model nests
    the other (``{'vae/': ''}``).
    """
    tflat = _flat(target_params)
    sflat = _flat(source_params)
    sflat_by_str = {'/'.join(map(str, k)): v for k, v in sflat.items()}
    copied = 0
    out = {}
    for key, tval in tflat.items():
        kstr = '/'.join(map(str, key))
        candidates = [kstr]
        if prefix_map:
            for tp, sp in prefix_map.items():
                if kstr.startswith(tp):
                    candidates.append(sp + kstr[len(tp):])
                else:
                    candidates.append(tp + kstr)
        sval = None
        for c in candidates:
            v = sflat_by_str.get(c)
            if v is not None and np.shape(v) == np.shape(tval):
                sval = v
                break
        if sval is not None:
            out[key] = sval
            copied += 1
        else:
            out[key] = tval
    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(target_params, restored), copied


def copy_encoder(target_params, source_params):
    """Encoder-only transfer (reference ``copy_encoder``, nnutils.py:45-62):
    copies every leaf whose path contains 'encoder' and matches in shape."""
    tflat = _flat(target_params)
    sflat = _flat(source_params)
    s_by_str = {'/'.join(map(str, k)): v for k, v in sflat.items()}
    out, copied = {}, 0
    for key, tval in tflat.items():
        kstr = '/'.join(map(str, key))
        v = None
        if 'encoder' in kstr:
            # cross-class nesting: PropOptVAE wraps PropertyVAE under 'vae/',
            # HierPropOptVAE under 'hier/' — try stripped and added prefixes
            for cand in (kstr, kstr.replace('vae/', '', 1),
                         kstr.replace('hier/', '', 1),
                         kstr.replace('params/', 'params/vae/', 1),
                         kstr.replace('params/', 'params/hier/', 1)):
                v = s_by_str.get(cand)
                if v is not None:
                    break
        if v is not None and np.shape(v) == np.shape(tval):
            out[key] = v
            copied += 1
        else:
            out[key] = tval
    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(target_params, restored), copied


class EarlyStopping:
    """Patience-based early stopping with best-checkpoint saving (the
    ``torchtools`` submodule interface the reference fine-tune drivers rely
    on, /root/reference/vae_fine_tune.py:11,67-68,145-148)."""

    def __init__(self, patience: int = 7, verbose: bool = False,
                 delta: float = 0.0, path: str = 'model.best'):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.path = path
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = float('inf')

    def __call__(self, val_loss: float, params) -> None:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self._save(val_loss, params)
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                print(f'EarlyStopping counter: {self.counter} / {self.patience}')
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self._save(val_loss, params)
            self.counter = 0

    def _save(self, val_loss: float, params) -> None:
        if self.verbose:
            print(f'Validation loss decreased ({self.val_loss_min:.6f} -> '
                  f'{val_loss:.6f}). Saving model to {self.path}')
        save_params(params, self.path)
        self.val_loss_min = val_loss


# -- orbax integration (multi-host / async production checkpointing) --------

def save_params_orbax(params, path: str) -> None:
    """Checkpoint via orbax (atomic, multi-host aware).  The msgpack
    ``save_params`` remains the default for single-host runs."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(params), force=True)
    ckptr.wait_until_finished()


def load_params_orbax(template, path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
