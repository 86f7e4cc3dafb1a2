"""Autoregressive motif decoder — teacher-forced training path.

TPU-first redesign of the reference ``MotifDecoder.sum_forward``
(/root/reference/ggpm/decoder.py:776-899).  The reference walks the DFS
generation order in a Python loop, re-encoding the partial junction tree with
a "sparse" incremental encoder and accumulating per-sample prediction tuples
in Python lists.  Here the entire walk is ONE ``jax.lax.scan``:

* carry  = dense message-RNN state over ``[num_mess + B, H]`` buffers (the B
  extra rows are the virtual root messages wired to the latent vector,
  reference ``init_decoder_state``, decoder.py:531-552);
* step   = batched RNN-cell application on the ≤B messages enabled at step t
  (precomputed in the host-side DecodePlan) followed by a gather-based node
  readout — no masks needed because un-enabled message rows are still zero;
* outputs = per-step topology and motif-prediction feature vectors, from
  which all losses are computed densely after the scan.

Equivalences exploited (verified against the reference):
* masking agraph/bgraph by the evolving ``emask`` (decoder.py:567-573) equals
  gathering from a state buffer in which un-enabled rows are zero;
* the reference's assembly scorer ``enum_attach`` for the motif decoder
  (decoder.py:605-622) does not read graph state: every real candidate gets
  the *same* score ``s`` and every zero-padded slot the same score ``p``, so
  the padded cross-entropy with label 0 collapses to the closed form
  ``log(nc·e^s + (maxc−nc)·e^p) − s`` and the symmetric accuracy to
  ``s ≥ p`` — computed here without materialising candidate tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.mol_graph import MAX_POS
from ..ops import gather_nd, nei_sum
from .encoder import pos_onehot
from .rnn import make_cell


def scope_mask(scope: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """[B, N] membership mask: row n belongs to molecule b iff it lies in
    b's scope window (tensorizer scope convention, mol_graph.py)."""
    ar = jnp.arange(n_rows)[None, :]
    return (ar >= scope[:, :1]) & (ar < scope[:, :1] + scope[:, 1:2])


def attend(src_mem, mask, query, A):
    """Attention context over per-molecule source memory.

    TPU-native redesign of the reference's ``attention``
    (decoder.py:124-134, gated by ``use_attention``, decoder.py:28): the
    reference bmm's per-prediction gathered source matrices; here the scores
    are one dense einsum against the flat [N, latent] memory table masked per
    molecule — no gather, fully batched.

    query: [..., B, H] (B second-to-last); returns [..., B, latent].
    """
    proj = A(query)
    scores = jnp.einsum('nl,...bl->...bn', src_mem, proj)
    neg = jnp.finfo(scores.dtype).min / 4
    scores = jnp.where(mask, scores, neg)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('...bn,nl->...bl', w, src_mem)


class PredictionMLP(nn.Module):
    """hidden→out two-layer head used by topo/cls/icls predictors
    (reference decoder.py:492-511)."""
    hidden_size: int
    out_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_size)(x)


class MotifDecoder(nn.Module):
    hvocab_size: int
    ivocab_size: int
    atom_vocab_size: int
    rnn_type: str = 'LSTM'
    embed_size: int = 250
    hidden_size: int = 250
    latent_size: int = 24
    diterT: int = 1
    dropout: float = 0.0
    remat: bool = False      # rematerialise the scan step (memory ↓, FLOPs ↑)
    use_attention: bool = False
    E_c: Optional[nn.Module] = None
    E_i: Optional[nn.Module] = None

    def setup(self):
        if self.E_c is None:
            self.E_c_mod = nn.Embed(self.hvocab_size, self.embed_size)
        if self.E_i is None:
            self.E_i_mod = nn.Embed(self.ivocab_size, self.embed_size)
        self.drop = nn.Dropout(self.dropout)
        self.rnn = make_cell(self.rnn_type, self.hidden_size, self.diterT)
        self.W_node = nn.Dense(self.hidden_size)   # IncMPNEncoder.W_o
        self.topoNN = PredictionMLP(hidden_size=self.hidden_size, out_size=1,
                                    dropout=self.dropout)
        self.clsNN = PredictionMLP(hidden_size=self.hidden_size,
                                   out_size=self.hvocab_size, dropout=self.dropout)
        self.iclsNN = PredictionMLP(hidden_size=self.hidden_size,
                                    out_size=self.ivocab_size, dropout=self.dropout)
        self.matchNN = nn.Dense(self.hidden_size)
        self.W_assm = nn.Dense(self.latent_size)
        if self.latent_size != self.hidden_size:
            self.W_root = nn.Dense(self.hidden_size)
        if self.use_attention:
            # attention context heads (reference decoder.py:62-65)
            self.A_topo = nn.Dense(self.latent_size)
            self.A_cls = nn.Dense(self.latent_size)
            self.A_assm = nn.Dense(self.latent_size)

    # -- shared helpers ----------------------------------------------------
    def _ec(self):
        return self.E_c if self.E_c is not None else self.E_c_mod

    def _ei(self):
        return self.E_i if self.E_i is not None else self.E_i_mod

    def root_vecs_to_hidden(self, root_vecs):
        if self.latent_size != self.hidden_size:
            return self.W_root(root_vecs)
        return root_vecs

    def topo_logit(self, tree_vecs, batch_vecs, topo_vecs, deterministic=True):
        ctx = batch_vecs
        x = jnp.concatenate([topo_vecs, ctx], axis=-1)
        return self.topoNN(x, deterministic)[..., 0]

    def cls_logits(self, cls_vecs, ctx, deterministic=True):
        x = jnp.concatenate([cls_vecs, ctx], axis=-1)
        return self.clsNN(x, deterministic), self.iclsNN(x, deterministic)

    def match_vec(self, icls_ids, n_icls, nth_child, deterministic=True):
        """Sum of matchNN over the (1 or 2) anchor attachment embeddings
        (reference ``enum_attach``, decoder.py:605-622; candidate-independent
        for the motif decoder)."""
        emb = self.drop(self._ei()(icls_ids), deterministic=deterministic)  # [..., 2, E]
        pos = pos_onehot(nth_child)[..., None, :]
        pos = jnp.broadcast_to(pos, emb.shape[:-1] + (MAX_POS,))
        v = nn.relu(self.matchNN(jnp.concatenate([emb, pos], axis=-1)))
        k_mask = (jnp.arange(2) < n_icls[..., None])[..., None]
        return (v * k_mask).sum(axis=-2)

    # -- teacher-forced training loss --------------------------------------
    def __call__(self, tree: Dict[str, Any], plan: Dict[str, Any],
                 root_vecs: jnp.ndarray, vocab_mask: jnp.ndarray,
                 deterministic: bool = True, src_mem=None):
        """Returns (loss, metrics) for a batch; all shapes static.

        ``src_mem`` ([N, latent] encoder node memory) enables the attention
        context heads when the module was built with ``use_attention``."""
        topo_vecs, cls_vecs, init_vecs = self._run_scan(
            tree, plan, root_vecs, deterministic)
        return self._losses(plan, root_vecs, init_vecs, vocab_mask,
                            topo_vecs, cls_vecs, root_vecs.shape[0],
                            deterministic, scope=tree['scope'],
                            src_mem=src_mem)

    def mean_forward(self, tree: Dict[str, Any], plan: Dict[str, Any],
                     root_vecs: jnp.ndarray, vocab_mask: jnp.ndarray,
                     deterministic: bool = True, src_mem=None):
        """Per-sample-accounted loss (reference ``MotifDecoder.mean_forward``,
        decoder.py:630-774, reached via ``forward(avg_loss=True)``,
        decoder.py:624-628).

        The reference accumulates sum-reduced losses per sample and divides
        the grand total by batch size — numerically identical to
        ``sum_forward``'s global sum / batch (the per-sample partition
        commutes with the sum; verified in tests/test_models.py).  What the
        variant adds is the per-sample loss breakdown, returned here as a
        ``[B]`` vector in the third output.
        """
        topo_vecs, cls_vecs, init_vecs = self._run_scan(
            tree, plan, root_vecs, deterministic)
        return self._losses(plan, root_vecs, init_vecs, vocab_mask,
                            topo_vecs, cls_vecs, root_vecs.shape[0],
                            deterministic, scope=tree['scope'],
                            src_mem=src_mem, return_per_sample=True)

    def _run_scan(self, tree, plan, root_vecs, deterministic):
        """Teacher-forced state recurrence + readouts.

        TPU restructure (round 4; semantics pinned by
        tests/test_scan_equivalence.py against the reference algorithm,
        decoder.py:776-899): the scan carries ONLY the message-state
        buffer — everything else is hoisted out as fat, parallel work:

        * per-slot cell inputs (embedding gathers, position one-hots) and
          the loop-invariant x-side gate projections are precomputed for
          all [T, L] slots in one matmul each and fed to the scan as xs;
        * the per-step body is one state gather + two h-side matmuls +
          one scatter (the reference's per-step ``sparse_forward``,
          rnn.py:110-121, restructured by linearity as in models/rnn.py);
        * the frontier readouts move AFTER the scan: each message row is
          written exactly once (at its DFS step), so reading the final
          state under a ``write_step[m] <= t`` visibility mask is exactly
          the reference's evolving ``emask``-gated gather
          (decoder.py:567-573) — verified against the naive
          reimplementation.  The readout over all slots is then a single
          batched gather + one fat matmul instead of T thin ones.

        ``diterT``: the motif-tree message DAG is acyclic and a step's
        predecessors never include same-step rows, so re-applying the cell
        within a step is idempotent — one application reproduces any
        diterT >= 1 exactly (the canonical config uses diterT=1).
        """
        fnode, fmess = tree['fnode'], tree['fmess']
        agraph, bgraph = tree['agraph_dec'], tree['bgraph_dec']
        num_mess = fmess.shape[0]

        init_vecs = self.root_vecs_to_hidden(root_vecs)

        # static per-batch embeddings (IncEncoder.embed_sub_tree equivalent;
        # node labels are known under teacher forcing so the per-step scatter
        # of the reference collapses to one precomputed table)
        hnode_emb = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        hmess_input = jnp.concatenate(
            [gather_nd(hnode_emb, fmess[:, 0]), pos_onehot(fmess[:, 2])], axis=-1)

        state = self.rnn.init_state(num_mess, init_vecs)
        n_state = len(state)
        H = self.hidden_size

        if self.is_initializing():
            # materialise scan-internal parameters outside lax.scan
            nei0 = tuple(jnp.zeros((1, bgraph.shape[1], self.hidden_size))
                         for _ in state)
            self.rnn.cell(hmess_input[:1], nei0)
            self.W_node(jnp.zeros((1, self.embed_size + self.hidden_size)))

        xid, mess = plan['xid'], plan['mess']
        T, L = mess.shape
        valid = mess > 0

        # hoisted per-slot scan inputs (fat, parallel)
        xp = self.rnn.x_proj(hmess_input)[mess]          # [T, L, kH]
        bg_rows = bgraph[mess]                           # [T, L, A]
        ks = self.rnn.k_h()

        S0 = state[0] if n_state == 1 else jnp.concatenate(state, axis=-1)

        def step(S, inputs):
            xp_t, bg_t, rows, val = inputs
            nei = gather_nd(S, bg_t)                     # [L, A, n·H]
            nei_t = tuple(nei[..., k * H:(k + 1) * H] for k in range(n_state))
            new_rows = self.rnn.step(xp_t, nei_t, ks)
            upd = new_rows[0] if n_state == 1 else \
                jnp.concatenate(new_rows, axis=-1)
            # invalid lanes carry rows == 0 and write zeros, so the padding
            # row stays all-zero without a separate mask-out
            S = S.at[rows].set(jnp.where(val[:, None], upd, 0.0))
            return S, None

        step_fn = jax.checkpoint(step) if self.remat else step
        S_final, _ = jax.lax.scan(step_fn, S0, (xp, bg_rows, mess, valid))
        h_final = S_final[..., :H]

        # write-step table: slot (t, l) wrote row mess[t, l] at step t;
        # virtual root rows (>= num_mess) are visible from step 0
        # (reference init_decoder_state, decoder.py:531-552); never-written
        # rows stay invisible (their state is zero anyway)
        never = jnp.int32(T + 1)
        ws = jnp.where(jnp.arange(S0.shape[0]) < num_mess, never,
                       jnp.int32(-1))
        tgrid = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                                 (T, L))
        ws = ws.at[jnp.where(valid, mess, 0)].set(
            jnp.where(valid, tgrid, never))

        # batched frontier readouts (IncMPNEncoder.forward equivalent)
        ag = agraph[xid]                                 # [T, L, A]
        vis = ws[ag] <= tgrid[..., None]
        nei_msg = (gather_nd(h_final, ag) * vis[..., None]).sum(axis=-2)
        topo_vecs = nn.relu(self.W_node(
            jnp.concatenate([hnode_emb[xid], nei_msg], axis=-1)))
        cls_vecs = gather_nd(h_final, mess)
        return topo_vecs, cls_vecs, init_vecs

    def _losses(self, plan, root_vecs, init_vecs, vocab_mask, topo_vecs,
                cls_vecs, batch_size, deterministic, scope=None, src_mem=None,
                return_per_sample=False):
        active = plan['active']
        T = topo_vecs.shape[0]
        # lane-packed plans (batching.compact_plan_dict) carry mol_lane
        # [T, L]: slot (t, l) belongs to molecule mol_lane[t, l], so every
        # per-molecule context becomes a gather instead of a broadcast
        mol_lane = plan.get('mol_lane')
        if mol_lane is not None:
            latent_b = root_vecs[mol_lane]
        else:
            latent_b = jnp.broadcast_to(root_vecs[None],
                                        (T, batch_size, self.latent_size))

        att = self.use_attention and src_mem is not None
        if att:
            mask = scope_mask(scope, src_mem.shape[0])
            mask_steps = mask[mol_lane] if mol_lane is not None else mask
            topo_ctx = attend(src_mem, mask_steps, topo_vecs, self.A_topo)
            root_cls_ctx = attend(src_mem, mask, init_vecs, self.A_cls)
            step_cls_ctx = attend(src_mem, mask_steps, cls_vecs, self.A_cls)
        else:
            topo_ctx = latent_b
            root_cls_ctx = root_vecs
            step_cls_ctx = latent_b

        # --- topology loss (BCE-with-logits, sum over active steps) -------
        topo_logits = self.topo_logit(None, topo_ctx, topo_vecs, deterministic)
        tlab = plan['tlab'].astype(jnp.float32)
        topo_bce = jnp.maximum(topo_logits, 0) - topo_logits * tlab + \
            jnp.log1p(jnp.exp(-jnp.abs(topo_logits)))
        act_f = active.astype(jnp.float32)
        topo_loss = (topo_bce * act_f).sum()
        topo_pred = (topo_logits >= 0).astype(jnp.int32)
        topo_acc = ((topo_pred == plan['tlab']) * active).sum() / jnp.maximum(active.sum(), 1)

        # --- motif (cls + icls) loss --------------------------------------
        # events: the B roots (context vector = latent) + every expand step
        root_cls_logits, root_icls_logits = self.cls_logits(
            init_vecs, root_cls_ctx, deterministic)
        step_cls_logits, step_icls_logits = self.cls_logits(
            cls_vecs, step_cls_ctx, deterministic)

        vmask = vocab_mask  # [hvocab, ivocab] additive log-mask
        root_icls_logits = root_icls_logits + vmask[plan['root_clab']]
        step_icls_logits = step_icls_logits + vmask[plan['clab']]

        def ce(logits, labels):
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
            return logz - gold

        has_cls = plan['has_cls'].astype(jnp.float32)
        cls_loss = ce(root_cls_logits, plan['root_clab']).sum() + \
            (ce(step_cls_logits, plan['clab']) * has_cls).sum()
        icls_loss = ce(root_icls_logits, plan['root_ilab']).sum() + \
            (ce(step_icls_logits, plan['ilab']) * has_cls).sum()

        n_cls = batch_size + has_cls.sum()
        cls_correct = (jnp.argmax(root_cls_logits, -1) == plan['root_clab']).sum() + \
            ((jnp.argmax(step_cls_logits, -1) == plan['clab']) * plan['has_cls']).sum()
        icls_correct = (jnp.argmax(root_icls_logits, -1) == plan['root_ilab']).sum() + \
            ((jnp.argmax(step_icls_logits, -1) == plan['ilab']) * plan['has_cls']).sum()
        cls_acc = cls_correct / n_cls
        icls_acc = icls_correct / n_cls

        # --- assembly loss (closed form, see module docstring) ------------
        mvec = self.match_vec(plan['assm_icls'], plan['assm_n_icls'],
                              plan['assm_nth'], deterministic)        # [T,B,H]
        bias = self.W_assm(jnp.zeros((self.hidden_size,)))
        if att:
            assm_ctx = attend(src_mem, mask_steps, mvec, self.A_assm)
            pad_ctx = attend(src_mem, mask,
                             jnp.zeros((batch_size, self.hidden_size)),
                             self.A_assm)
            s = (self.W_assm(mvec) * assm_ctx).sum(-1)
            p_mol = (bias * pad_ctx).sum(-1)                           # [B]
        else:
            s = (self.W_assm(mvec) * latent_b).sum(-1)                 # real-cand score
            p_mol = (bias * root_vecs).sum(-1)                         # pad-slot score [B]
        p = p_mol[mol_lane] if mol_lane is not None else p_mol[None, :]
        nc = plan['assm_nc'].astype(jnp.float32)
        maxc = plan['max_cls_size'].astype(jnp.float32)
        m = jnp.maximum(s, p)
        lse = jnp.log(nc * jnp.exp(s - m) +
                      jnp.maximum(maxc - nc, 0.0) * jnp.exp(p - m) + 1e-12) + m
        has_assm = plan['has_assm'].astype(jnp.float32)
        assm_loss = ((lse - s) * has_assm).sum()
        assm_correct = (s >= p) | (nc >= maxc)
        assm_acc = jnp.where(
            has_assm.sum() > 0,
            (assm_correct * plan['has_assm']).sum() / jnp.maximum(plan['has_assm'].sum(), 1),
            1.0)

        loss = (topo_loss + cls_loss + icls_loss + assm_loss) / batch_size
        metrics = {
            'Word': cls_acc, 'I-Word': icls_acc, 'Topo': topo_acc,
            'Assm': assm_acc,
        }
        if return_per_sample:
            # per-sample loss partition (mean_forward): summing these over the
            # batch reproduces loss * batch_size exactly.  Lane-packed plans
            # mix molecules within a lane, so the partition is a segment-sum
            # over mol_lane instead of a sum over the step axis (inactive
            # slots carry zero terms and land in segment 0 harmlessly).
            if mol_lane is not None:
                seg = lambda x: jax.ops.segment_sum(
                    x.reshape(-1), mol_lane.reshape(-1),
                    num_segments=batch_size)
            else:
                seg = lambda x: x.sum(0)
            topo_ps = seg(topo_bce * act_f)
            cls_ps = ce(root_cls_logits, plan['root_clab']) + \
                seg(ce(step_cls_logits, plan['clab']) * has_cls)
            icls_ps = ce(root_icls_logits, plan['root_ilab']) + \
                seg(ce(step_icls_logits, plan['ilab']) * has_cls)
            assm_ps = seg((lse - s) * has_assm)
            per_sample = topo_ps + cls_ps + icls_ps + assm_ps
            return loss, metrics, per_sample
        return loss, metrics

    # -- scheduled-sampling variant ----------------------------------------
    def scheduled_forward(self, tree: Dict[str, Any], plan: Dict[str, Any],
                          root_vecs: jnp.ndarray, vocab_mask: jnp.ndarray,
                          tf_ratio: float, sched_rng: jax.Array,
                          deterministic: bool = True):
        """Teacher forcing with scheduled sampling (the repaired intent of the
        reference's MotifSchedulingDecoder, decoder.py:1098-1606, whose
        implementation is broken — it references undefined attributes).

        Per (step, sample) a coin with probability ``1 − tf_ratio`` replaces
        the *gold* motif embedding of the newly expanded node with the
        embedding of the model's own top-1 motif prediction, so later message
        inputs see the model's choices.  Losses still use gold labels.
        """
        fnode, fmess = tree['fnode'], tree['fmess']
        agraph, bgraph = tree['agraph_dec'], tree['bgraph_dec']
        num_mess = fmess.shape[0]
        batch_size = root_vecs.shape[0]

        init_vecs = self.root_vecs_to_hidden(root_vecs)
        hnode_emb = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        pos_tab = pos_onehot(fmess[:, 2])
        state = self.rnn.init_state(num_mess, init_vecs)

        if self.is_initializing():
            nei0 = tuple(jnp.zeros((1, bgraph.shape[1], self.hidden_size))
                         for _ in state)
            self.rnn.cell(jnp.zeros((1, self.embed_size + MAX_POS)), nei0)
            self.W_node(jnp.zeros((1, self.embed_size + self.hidden_size)))
            self.clsNN(jnp.zeros((1, self.hidden_size + self.latent_size)), True)

        T, lanes = plan['xid'].shape
        coins = jax.random.uniform(sched_rng, (T, lanes)) > tf_ratio
        # lane-packed plans: slot → molecule map for the per-step latent ctx
        mol_lane = plan.get('mol_lane')
        lane_mol = mol_lane if mol_lane is not None else \
            jnp.broadcast_to(jnp.arange(batch_size, dtype=jnp.int32)[None],
                             (T, lanes))

        def step(carry, inputs):
            state, emb_buf = carry
            rows, x_nodes, coin, has_cls, mol_t = inputs
            valid = (rows > 0)
            src = fmess[rows, 0]
            dst = fmess[rows, 1]

            def diter_body(_, st):
                x = jnp.concatenate([emb_buf[src], pos_tab[rows]], axis=-1)
                nei = tuple(gather_nd(s, bgraph[rows]) for s in st)
                new_rows = self.rnn.cell(x, nei)
                # invalid lanes target row 0 and write 0.0 — one masked
                # scatter replaces gather+where+scatter+row0-fixup (the
                # idiom of _run_scan's state update above)
                return tuple(
                    s.at[rows].set(jnp.where(valid[:, None], nr, 0.0))
                    for s, nr in zip(st, new_rows))

            state = jax.lax.fori_loop(0, self.diterT, diter_body, state)
            h = self.rnn.hidden(state)
            nei_msg = nei_sum(h, agraph[x_nodes])
            node_h = nn.relu(self.W_node(
                jnp.concatenate([hnode_emb[x_nodes], nei_msg], axis=-1)))
            cls_h = h[rows]
            # model's own motif prediction for the expanded node
            cls_logits = self.clsNN(
                jnp.concatenate([cls_h, root_vecs[mol_t]], axis=-1), True)
            pred = jnp.argmax(cls_logits, axis=-1)
            use_pred = coin & has_cls & valid
            pred_emb = self._ec()(pred)
            emb_buf = emb_buf.at[dst].set(
                jnp.where(use_pred[:, None], pred_emb, emb_buf[dst]))
            emb_buf = emb_buf.at[0].set(hnode_emb[0])
            return (state, emb_buf), (node_h, cls_h)

        xs = (plan['mess'], plan['xid'], coins, plan['has_cls'], lane_mol)
        (_, _), (topo_vecs, cls_vecs) = jax.lax.scan(
            step, (state, hnode_emb), xs)
        return self._losses(plan, root_vecs, init_vecs, vocab_mask,
                            topo_vecs, cls_vecs, batch_size, deterministic)

    # -- autoregressive decode step functions ------------------------------
    # Jitted by ggpm_tpu.models.decode; fixed [B]-shaped inputs per step.
    # These mirror the two IncEncoder calls per reference decode step
    # (decoder.py:979, 1012) with the graph bookkeeping held host-side.

    def dec_init_state(self, num_rows: int, root_vecs: jnp.ndarray):
        """Zero message state with the latent wired into rows 1..B (the
        super-root→root edges; reference decoder.py:954-958)."""
        init = self.root_vecs_to_hidden(root_vecs)
        state = self.rnn.init_state(num_rows)
        b = init.shape[0]
        h = state[0].at[1:b + 1].set(init)
        return (h,) + tuple(state[1:])

    def dec_update(self, state, rows, src_clab, pos, bgraph_rows):
        """Compute messages for newly added edges (sparse_forward on the
        ≤B rows enabled this step)."""
        x = jnp.concatenate(
            [self._ec()(src_clab), pos_onehot(pos)], axis=-1)
        valid = rows > 0
        for _ in range(self.diterT):
            nei = tuple(s[bgraph_rows] for s in state)
            new = self.rnn.cell(x, nei)
            # invalid lanes have rows == 0; writing 0.0 there keeps the
            # padding row zero without the extra gather + row0 scatter
            state = tuple(
                s.at[rows].set(jnp.where(valid[:, None], nr, 0.0))
                for s, nr in zip(state, new))
        return state

    def _dec_ctx(self, query, head, root_ctx, src_mem, src_mask):
        """Decode-time head context.  With encoder node memory provided and
        ``use_attention`` set, attend over it exactly as the training heads
        do (``_losses``); otherwise the latent is the context (non-attention
        models, and prior sampling where no source molecule exists)."""
        if self.use_attention and src_mem is not None:
            return attend(src_mem, src_mask, query, head)
        return root_ctx

    def dec_topo(self, state, v_clab, agraph_rows, root_vecs,
                 src_mem=None, src_mask=None):
        """Frontier-node readout + topology logit (expand vs backtrack)."""
        h = self.rnn.hidden(state)
        nei = h[agraph_rows].sum(axis=-2)
        node_h = nn.relu(self.W_node(
            jnp.concatenate([self._ec()(v_clab), nei], axis=-1)))
        ctx = self._dec_ctx(node_h, self.A_topo if self.use_attention
                            else None, root_vecs, src_mem, src_mask)
        return self.topo_logit(None, ctx, node_h)

    def dec_cls(self, state, rows, root_vecs, src_mem=None, src_mask=None):
        """Motif/attachment logits from the new expand messages."""
        h = self.rnn.hidden(state)
        ctx = self._dec_ctx(h[rows], self.A_cls if self.use_attention
                            else None, root_vecs, src_mem, src_mask)
        return self.cls_logits(h[rows], ctx)

    def dec_update_cls_topk(self, state, rows, src_clab, pos, bgraph_rows,
                            root_vecs, vocab_mask, beam: int,
                            src_mem=None, src_mask=None):
        """Fused decode step: message update + motif logits + hierarchical
        top-k in one device call (minimises host↔device roundtrips per
        decode step)."""
        from .decode import hier_topk
        state = self.dec_update(state, rows, src_clab, pos, bgraph_rows)
        cls_scores, icls_scores = self.dec_cls(state, rows, root_vecs,
                                               src_mem, src_mask)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        return state, scores, cls_k, icls_k

    def dec_root_cls(self, root_vecs, src_mem=None, src_mask=None):
        init = self.root_vecs_to_hidden(root_vecs)
        ctx = self._dec_ctx(init, self.A_cls if self.use_attention
                            else None, root_vecs, src_mem, src_mask)
        return self.cls_logits(init, ctx)

    def dec_step_fused(self, state, v_clab, agraph_rows, can_expand, u,
                       new_rows, exp_src_clab, exp_bg_rows,
                       bt_valid, bt_src_clab, bt_pos, bt_bg_rows,
                       root_vecs, vocab_mask, beam: int,
                       src_mem=None, src_mask=None):
        """ONE device call per decode step (speculative branch selection).

        The per-step decode round-trip is tunnel-latency-bound (~26 ms per
        host sync on the TPU relay, independent of batch size), so the old
        topology-call → host-edit → update-call split paid two syncs per
        step.  Both branches' message inputs are computable *before* the
        topology decision — an expand edge's predecessors are exactly the
        frontier's incoming edges, a backtrack edge's are the frontier's
        minus the reverse edge — so the host passes both input sets and the
        device selects per sample:

          expand   iff  sigmoid(topo) > u  and  the frontier can expand
          backtrack otherwise (message row only if a backtrack edge exists)

        ``u`` is 0.5 for greedy decoding or a uniform sample for stochastic
        decoding (reference decoder.py:999-1004).  Returns
        (state, topo_logits, choose, scores, cls_topk, icls_topk); the host
        replays the identical ``choose`` to keep tree state in lockstep.
        """
        from .decode import hier_topk
        topo_logits = self.dec_topo(state, v_clab, agraph_rows, root_vecs,
                                    src_mem, src_mask)
        choose = (jax.nn.sigmoid(topo_logits) > u) & can_expand
        valid = choose | bt_valid
        rows = jnp.where(valid, new_rows, 0)
        src_clab = jnp.where(choose, exp_src_clab, bt_src_clab)
        pos = jnp.where(choose, 0, bt_pos)
        bg = jnp.where(choose[:, None], exp_bg_rows, bt_bg_rows)
        state = self.dec_update(state, rows, src_clab, pos, bg)
        cls_scores, icls_scores = self.dec_cls(state, rows, root_vecs,
                                               src_mem, src_mask)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        # pack every host-bound output into ONE array: each fetched array
        # pays a full tunnel round-trip, so five outputs would cost 5 RTTs
        packed = jnp.concatenate(
            [topo_logits[:, None], choose.astype(jnp.float32)[:, None],
             scores, cls_k.astype(jnp.float32),
             icls_k.astype(jnp.float32)], axis=1)
        return state, packed

    def dec_propose(self, root_vecs, vocab_mask, u_seq, pin_op, pin_clab,
                    pin_ilab, tabs, beam: int, max_nb: int = 12):
        """Device-RESIDENT speculative decode: the whole autoregressive loop
        as ONE ``lax.scan`` — zero host round-trips until the single final
        fetch.

        The per-step decisions of the exact host loop (``decode_motif``)
        split into (a) neural choices + structural tree bookkeeping and
        (b) chemistry (assembly-candidate enumeration + validity).  (a) is
        computable entirely on device: ``can_expand`` is purely structural
        (in-degree < max_nb, inc_graph.IncBase.can_expand), edge positions
        are in-degrees, and message inputs depend only on node motif labels
        — which the device KNOWS if every expand step commits to the beam-0
        motif.  This scan therefore speculates beam-0 assembly success at
        every step and records the full decision trace; the host replays it
        with real chemistry (``decode.decode_motif_turbo``).

        Samples where chemistry rejects the speculation re-enter with their
        executed prefix PINNED (``pin_op``/``pin_clab``/``pin_ilab``, shape
        [T, B]): op 0 = free speculation, 1 = expand committing
        ``(pin_clab, pin_ilab)`` as the new node's motif, 2 = backtrack,
        3 = expand-then-forced-backtrack (the exact path's assembly total
        failure, reference decoder.py:1079-1089 — message computed, node
        and parent popped, the closing edges carry zero messages so only
        in-degrees advance).  Each round resolves at least one divergence
        per sample, so the host round loop terminates without ever paying a
        per-step round-trip.

        ASSEMBLY ORACLE: beam-0 speculation alone pays one full round per
        chemistry rejection, so the scan carries a tensorised model of
        the host assembly chemistry (``decode._assm_tables``) and commits,
        at each expand step, the FIRST beam candidate with a feasible
        attachment — executing forced-backtrack semantics in-scan when no
        beam has one (the exact path's total assembly failure, reference
        decoder.py:1079-1089).  Feasibility replicates
        ``IncGraph.get_assm_cands`` + ``try_add_mol``: candidates are
        consecutive runs of the parent's cluster-atom list, endpoint
        atom-types must match (``bond_match`` is type-only), used atoms
        are excluded for 1-point attachments, and each attachment point
        must have free valence for the bonds the graft adds.  The dynamic
        per-node state is two slot vectors (used flags + free valences)
        plus the anchor-pair exclusion and a no-opinion flag; everything
        else is static per-icls tables.  The oracle abstains (feasible =
        yes) for >2-point attachments, oversize motifs and exotic atoms,
        and the host replay remains ground truth either way: a wrong
        prediction is just a divergence, never a semantics change.

        Returns (packed [T, B, 2+3·beam+2] — the dec_step_fused layout per
        step, plus the committed beam slot (−1 = predicted forced
        backtrack) and the committed icls — plus root_cls [B],
        root_icls [B]).
        """
        from .decode import hier_topk, ORACLE_ATOMS
        batch_size = root_vecs.shape[0]
        T = u_seq.shape[0]
        n_nodes = T + 2                       # every expand consumes a step
        rows_per = T + 1                      # super-root edge + 1 row/step
        n_rows = 1 + batch_size * rows_per
        base = (1 + jnp.arange(batch_size) * rows_per).astype(jnp.int32)

        init = self.root_vecs_to_hidden(root_vecs)
        state = self.rnn.init_state(n_rows)
        state = (state[0].at[base].set(init.astype(state[0].dtype)),) + \
            tuple(state[1:])

        # root motif (reference decoder.py:914-948): masked fine argmax
        cls_l, icls_l = self.cls_logits(init, root_vecs)
        root_cls = jnp.argmax(cls_l, axis=-1).astype(jnp.int32)
        root_icls = jnp.argmax(icls_l + vocab_mask[root_cls],
                               axis=-1).astype(jnp.int32)

        S = tabs['stype'].shape[1]
        A = ORACLE_ATOMS
        ar = jnp.arange(batch_size)
        clab = jnp.zeros((batch_size, n_nodes), jnp.int32).at[:, 0].set(root_cls)
        ilab = jnp.zeros((batch_size, n_nodes), jnp.int32).at[:, 0].set(root_icls)
        slot_used = jnp.zeros((batch_size, n_nodes, S),
                              bool).at[:, 0].set(tabs['bused'][root_icls])
        # free valence is a property of the underlying MOL ATOM, which is
        # shared between a parent cluster and the child grafted onto it —
        # track it per sample-local atom id (mirroring add_mol's numbering)
        # with a per-node slot→atom map, NOT per (node, slot)
        atom_fv = jnp.zeros((batch_size, A),
                            jnp.int32).at[:, :S].set(tabs['bfv'][root_icls])
        slot_atom = jnp.zeros((batch_size, n_nodes, S), jnp.int32) \
            .at[:, 0, :].set(jnp.arange(S)[None, :])
        atom_cnt = tabs['n_at'][root_icls].astype(jnp.int32)
        node_as2 = jnp.zeros((batch_size, n_nodes), bool)
        node_noop = jnp.zeros((batch_size, n_nodes),
                              bool).at[:, 0].set(tabs['noop'][root_icls])
        in_deg = jnp.zeros((batch_size, n_nodes), jnp.int32).at[:, 0].set(1)
        agraph = jnp.zeros((batch_size, n_nodes, max_nb),
                           jnp.int32).at[:, 0, 0].set(base)
        down_row = jnp.zeros((batch_size, n_nodes), jnp.int32).at[:, 0].set(base)
        stack = jnp.zeros((batch_size, n_nodes), jnp.int32)
        sp = jnp.ones((batch_size,), jnp.int32)
        nxt = jnp.ones((batch_size,), jnp.int32)

        def step(carry, inputs):
            state, clab, ilab, slot_used, atom_fv, slot_atom, atom_cnt, \
                node_as2, node_noop, in_deg, agraph, down_row, stack, sp, \
                nxt = carry
            t, u, p_op, p_clab, p_ilab = inputs
            active = sp > 0
            v = stack[ar, jnp.maximum(sp - 1, 0)]
            v_clab = clab[ar, v]
            v_ag = agraph[ar, v]

            topo_logits = self.dec_topo(state, v_clab, v_ag, root_vecs)
            can_exp = in_deg[ar, v] < max_nb
            spec = (jax.nn.sigmoid(topo_logits) > u) & can_exp
            free = p_op == 0

            top = stack[ar, jnp.maximum(sp - 2, 0)]
            # branch selection must happen BEFORE the oracle (the oracle
            # needs cls/icls top-k, which needs the expand message) — so
            # "attempt expand" covers both commit and predicted-op3; the
            # backtrack branch is as before
            attempt = jnp.where(free, spec, (p_op == 1) | (p_op == 3)) & active
            choose = attempt
            bt_valid = active & (~choose) & (sp >= 2)
            bt_pos = jnp.minimum(in_deg[ar, top], MAX_POS - 1)
            bt_bg = jnp.where(v_ag == down_row[ar, v][:, None], 0, v_ag)

            row_t = base + 1 + t
            rows = jnp.where(choose | bt_valid, row_t, 0)
            pos = jnp.where(choose, 0, bt_pos)
            bg = jnp.where(choose[:, None], v_ag, bt_bg)
            state = self.dec_update(state, rows, v_clab, pos, bg)
            cls_s, icls_s = self.dec_cls(state, rows, root_vecs)
            scores, cls_k, icls_k = hier_topk(cls_s, icls_s, vocab_mask, beam)

            # ---- assembly oracle: first beam with a feasible attachment --
            # ONE packed gather for every parent column (the scan body is
            # op-launch-bound; see decode._assm_tables' pack layout)
            v_il = ilab[ar, v]                                 # [B]
            pp = tabs['ppack'][v_il]                           # [B, 3+7S]
            p_n = pp[:, 0]                                     # [B]
            p_typ = pp[:, 3:3 + S]                             # [B, S]
            p_ap = pp[:, 1:3]                                  # [B, 2]
            # neighbour slots in cluster-list order (candidates are
            # consecutive runs of the cluster list, inc_graph.py:316-331);
            # ring neighbours + their types + motif bond orders are static
            # per icls and come packed (see decode._assm_tables)
            t_nxt = pp[:, 3 + S:3 + 2 * S]
            t_prv = pp[:, 3 + 2 * S:3 + 3 * S]
            ab_nxt = pp[:, 3 + 3 * S:3 + 4 * S]
            ab_prv = pp[:, 3 + 4 * S:3 + 5 * S]
            nxt_s = pp[:, 3 + 5 * S:3 + 6 * S]
            prv_s = pp[:, 3 + 6 * S:3 + 7 * S]
            p_used = slot_used[ar, v]                          # [B, S]
            p_slot_atom = slot_atom[ar, v]                     # [B, S]
            p_fv = jnp.take_along_axis(atom_fv, p_slot_atom,
                                       axis=1)                 # [B, S]
            p_as2 = node_as2[ar, v]                            # [B]
            p_noop = node_noop[ar, v]                          # [B]
            p_single = p_n <= 1                                # [B]

            sidx = jnp.arange(S)
            s_valid = sidx[None, :] < p_n[:, None]             # [B, S]
            # free valence of each slot's fwd+rev ring neighbour (dynamic —
            # ONE fused take_along_axis instead of two)
            fv2 = jnp.take_along_axis(
                p_fv, jnp.concatenate([nxt_s, prv_s], axis=1), axis=1)
            fv_nxt, fv_prv = fv2[:, :S], fv2[:, S:]
            ap0, ap1 = p_ap[:, 0:1], p_ap[:, 1:2]
            excl_f = p_as2[:, None] & (
                ((sidx[None, :] == ap0) & (nxt_s == ap1)) |
                ((sidx[None, :] == ap1) & (nxt_s == ap0)))     # [B, S]
            excl_r = p_as2[:, None] & (
                ((sidx[None, :] == ap0) & (prv_s == ap1)) |
                ((sidx[None, :] == ap1) & (prv_s == ap0)))

            def feas_for(c_il):
                """Feasibility + first-candidate slots for child icls
                matrix ``c_il`` [B, Kc] against the current parent state.
                Returns (feas [B,Kc], slotA [B,Kc], slotB [B,Kc],
                extraA [B,Kc], extraB [B,Kc], committed-is-pair [B,Kc])."""
                cp = tabs['cpack'][c_il]                       # [B, Kc, 10]
                c_isz = cp[..., 0]
                c_fail = cp[..., 1].astype(bool)
                c_noop = cp[..., 2].astype(bool)
                c_sym = cp[..., 3].astype(bool)
                c_t0 = cp[..., 4]
                c_t1 = cp[..., 5]
                c_n0 = cp[..., 6]
                c_n1 = cp[..., 7]
                c_apb = cp[..., 8]

                # 1-point: any unused, type-matching slot with free valence
                # (get_assm_cands:316-317 + try_add_mol type/valence test)
                f1 = s_valid[:, None, :] & (~p_used[:, None, :]) & \
                    (p_typ[:, None, :] == c_t0[..., None]) & \
                    (p_fv[:, None, :] >= c_n0[..., None])      # [B,Kc,S]
                any1 = f1.any(-1)
                first1 = jnp.argmax(f1, axis=-1).astype(jnp.int32)

                # 2-point forward pairs (s, s+1 mod n): endpoint types match
                # (bond_match is type-only, chemutils.py:120-123), pair not
                # the parent's own grafted anchor pair, valences cover the
                # needs plus the anchor bond where the parent lacks it
                ex_f = (ab_nxt[:, None, :] == 0) * c_apb[..., None]
                pair_ok = s_valid[:, None, :] & \
                    (p_n[:, None, None] >= 2) & (~excl_f[:, None, :])
                ff = pair_ok & \
                    (p_typ[:, None, :] == c_t0[..., None]) & \
                    (t_nxt[:, None, :] == c_t1[..., None]) & \
                    (p_fv[:, None, :] >= c_n0[..., None] + ex_f) & \
                    (fv_nxt[:, None, :] >= c_n1[..., None] + ex_f)
                anyf = ff.any(-1)
                firstf = jnp.argmax(ff, axis=-1).astype(jnp.int32)

                # reverse pairs (a, a-1 mod n), enumerated a = n-1, n-2, …
                # (cands += rev[i:i+2], inc_graph.py:325-328)
                ex_r = (ab_prv[:, None, :] == 0) * c_apb[..., None]
                fr = s_valid[:, None, :] & \
                    (p_n[:, None, None] >= 2) & (~excl_r[:, None, :]) & \
                    (p_typ[:, None, :] == c_t0[..., None]) & \
                    (t_prv[:, None, :] == c_t1[..., None]) & \
                    (p_fv[:, None, :] >= c_n0[..., None] + ex_r) & \
                    (fv_prv[:, None, :] >= c_n1[..., None] + ex_r)
                anyr = fr.any(-1)
                # first in enumeration = LARGEST feasible slot index
                lastr = (S - 1 - jnp.argmax(fr[..., ::-1], axis=-1)) \
                    .astype(jnp.int32)

                use_fwd = anyf
                use_rev = (~c_sym) & (~anyf) & anyr
                feas2 = anyf | ((~c_sym) & anyr)
                feas = (~c_fail) & (
                    c_noop | p_noop[:, None] |
                    ((c_isz == 1) & any1) |
                    ((c_isz == 2) & feas2))
                is2 = (c_isz == 2) & (~c_noop) & (~p_noop[:, None])
                slotA = jnp.where(c_isz == 1, first1,
                                  jnp.where(use_rev, lastr, firstf))
                # fwd/rev neighbour + extra selected in one gather each by
                # offsetting the slot index into a [.., 2S] concatenation
                sel = slotA + jnp.where(use_rev, 0, S)
                slotB = jnp.take_along_axis(
                    jnp.concatenate([prv_s, nxt_s], axis=1)[:, None, :],
                    sel[..., None], axis=2)[..., 0]
                exA = jnp.take_along_axis(
                    jnp.concatenate([ex_r, ex_f], axis=2),
                    sel[..., None], axis=2)[..., 0]
                extraA = c_n0 + jnp.where(c_isz == 2, exA, 0)
                extraB = c_n1 + jnp.where(c_isz == 2, exA, 0)
                return feas, slotA, slotB, extraA, extraB, is2

            # ONE oracle call for the beam AND the committed child: column
            # K carries the pinned icls, so the commit-time columns below
            # are take_along_axis selections instead of a second feas_for
            # (same inputs — both calls read the pre-update carry — so this
            # is bit-exact; the scan body is op-launch-bound and feas_for
            # is ~70 primitives)
            cand_il = jnp.concatenate([icls_k, p_ilab[:, None]], axis=1)
            feas_all, slotA_all, slotB_all, exA_all, exB_all, is2_all = \
                feas_for(cand_il)                              # [B, K+1]
            feasible = feas_all[:, :beam]                      # [B, K]
            any_feas = feasible.any(axis=1)
            j_star = jnp.argmax(feasible, axis=1).astype(jnp.int32)
            spec_clab = jnp.take_along_axis(
                cls_k, j_star[:, None], axis=1)[:, 0].astype(jnp.int32)
            spec_ilab = jnp.take_along_axis(
                icls_k, j_star[:, None], axis=1)[:, 0].astype(jnp.int32)

            # pinned expands commit the host's resolved motif; free expands
            # commit the first feasible beam (beam 0 when the oracle has no
            # opinion); oracle-infeasible free expands forced-backtrack
            forced_free = free & attempt & (~any_feas)
            forced = ((p_op == 3) & active) | forced_free
            new_clab = jnp.where(p_op == 1, p_clab,
                                 jnp.where(any_feas, spec_clab,
                                           cls_k[:, 0].astype(jnp.int32)))
            new_ilab = jnp.where(p_op == 1, p_ilab,
                                 jnp.where(any_feas, spec_ilab,
                                           icls_k[:, 0].astype(jnp.int32)))

            # expand bookkeeping (masked writes: non-choosing samples
            # redirect their scatter index out of bounds, which mode='drop'
            # discards — no read-back gather of the old value needed; nxt
            # never reaches n_nodes within the T-step budget, so index
            # n_nodes is a pure mask sentinel)
            nn_i = jnp.minimum(nxt, n_nodes - 1)
            i_ch = jnp.where(choose, nn_i, n_nodes)
            clab = clab.at[ar, i_ch].set(new_clab, mode='drop')
            down_row = down_row.at[ar, i_ch].set(row_t, mode='drop')
            agraph = agraph.at[ar, i_ch, 0].set(row_t, mode='drop')
            in_deg = in_deg.at[ar, i_ch].set(1, mode='drop')
            sp_slot = jnp.minimum(sp, n_nodes - 1)
            stack = stack.at[ar, jnp.where(choose, sp_slot, n_nodes)].set(
                nn_i, mode='drop')
            # backtrack bookkeeping: the closing edge joins top's agraph
            # (host add_edge: agraph[j, in_degree(j)-1] = idx)
            slot = jnp.minimum(in_deg[ar, top], max_nb - 1)
            agraph = agraph.at[ar, jnp.where(bt_valid, top, n_nodes),
                               slot].set(row_t, mode='drop')
            # forced backtrack (op 3): host pops the new node AND its parent,
            # closing edges new→v and v→top (reference decoder.py:1079-1089).
            # Those edges never receive device messages (rows stay zero), so
            # only the in-degrees of v and top advance; agraph slots keep
            # their zero (= padding row) entries.
            close_top = bt_valid | (forced & (sp >= 2))
            in_deg = in_deg.at[ar, top].add(close_top.astype(jnp.int32))
            in_deg = in_deg.at[ar, v].add(forced.astype(jnp.int32))

            push = choose & (~forced)
            pop = active & (~choose)
            sp = sp + push.astype(jnp.int32) - pop.astype(jnp.int32) \
                - forced.astype(jnp.int32)
            nxt = nxt + choose.astype(jnp.int32)

            # ---- chemistry-state bookkeeping on committed expands -------
            # (host counterpart: try_add_mol's graft + update_attached)
            commit = choose & (~forced)
            ilab = ilab.at[ar, i_ch].set(new_ilab, mode='drop')
            # committed column of the merged oracle call: the pinned column
            # (K) for op==1, else the committed beam (j_star, or beam 0
            # when no beam is feasible) — matches new_ilab above, so these
            # selections equal feas_for(new_ilab[:, None]) exactly
            j_commit = jnp.where(p_op == 1, beam,
                                 jnp.where(any_feas, j_star, 0))[:, None]
            sel_c = lambda x: jnp.take_along_axis(x, j_commit, axis=1)[:, 0]
            c_feas = sel_c(feas_all)
            slotA = sel_c(slotA_all)
            slotB = sel_c(slotB_all)
            exA = sel_c(exA_all)
            exB = sel_c(exB_all)
            is2 = sel_c(is2_all)
            # ONE packed gather for every child-birth column (see
            # decode._assm_tables' bpack layout)
            bp = tabs['bpack'][new_ilab]                       # [B, 8+5S]
            ni_noop = bp[:, 2].astype(bool)
            oracle_on = (~p_noop) & (~ni_noop)
            do_c = commit & c_feas & oracle_on
            do_pair = do_c & is2
            # a pinned commit the oracle deems infeasible means its state
            # for this node has drifted — stop predicting from it
            mispin = commit & (~c_feas) & oracle_on
            node_noop = node_noop.at[ar, v].set(node_noop[ar, v] | mispin)

            # parent slots: mark used (skipped for singleton parents, which
            # never consume — inc_graph.py:108-111); valence is paid on the
            # underlying ATOMS, which parent and child clusters share
            curA_used = jnp.take_along_axis(p_used, slotA[:, None], 1)[:, 0]
            curB_used = jnp.take_along_axis(p_used, slotB[:, None], 1)[:, 0]
            slot_used = slot_used.at[ar, v, slotA].set(
                jnp.where(do_c & (~p_single), True, curA_used))
            slot_used = slot_used.at[ar, v, slotB].set(
                jnp.where(do_pair & (~p_single), True, curB_used))
            paA = jnp.take_along_axis(p_slot_atom, slotA[:, None], 1)[:, 0]
            paB = jnp.take_along_axis(p_slot_atom, slotB[:, None], 1)[:, 0]
            atom_fv = atom_fv.at[ar, paA].add(jnp.where(do_c, -exA, 0))
            atom_fv = atom_fv.at[ar, paB].add(jnp.where(do_pair, -exB, 0))

            # child node: used flags at birth; slot→atom map follows
            # add_mol's numbering (attach endpoints alias the parent's
            # chosen atoms, every other slot gets a fresh sequential id)
            ch_used = jnp.where(choose[:, None],
                                bp[:, 8:8 + S].astype(bool),
                                slot_used[ar, nn_i])
            slot_used = slot_used.at[ar, nn_i].set(ch_used)
            ch_ap = bp[:, 5:7]                                 # [B, 2]
            isz2c = bp[:, 1] >= 2
            ch_bfv = bp[:, 8 + S:8 + 2 * S]                    # [B, S]
            sidxS = jnp.arange(S)[None, :]
            ch_new_atom = jnp.minimum(
                atom_cnt[:, None] + bp[:, 8 + 2 * S:8 + 3 * S], A - 1)
            ch_atom = jnp.where(
                sidxS == ch_ap[:, 0:1], paA[:, None],
                jnp.where(isz2c[:, None] & (sidxS == ch_ap[:, 1:2]),
                          paB[:, None], ch_new_atom))
            slot_atom = slot_atom.at[ar, nn_i].set(
                jnp.where(choose[:, None], ch_atom, slot_atom[ar, nn_i]))
            # birth free valences for the NEW atoms only (attach slots keep
            # the shared atom's already-decremented value)
            ch_valid = sidxS < bp[:, 0:1]
            wmask = do_c[:, None] & ch_valid & \
                (~bp[:, 8 + 3 * S:8 + 4 * S].astype(bool))
            wtgt = jnp.where(wmask, ch_atom, A - 1)
            atom_fv = atom_fv.at[ar[:, None], wtgt].set(ch_bfv)
            n_new = bp[:, 0] - 1 - isz2c.astype(jnp.int32)
            atom_cnt = atom_cnt + jnp.where(do_c, jnp.maximum(n_new, 0), 0)
            # grafted-onto-existing-bond marker: add_mol records the anchor
            # pair as used when the bond pre-exists (inc_graph.py:195-196).
            # NOTE twin in hier_decoder.hdec_propose: there the condition is
            # `exA == 0` because its exA is the RAW anchor-bond extra
            # valence, while this file's exA is extraA = needs[0] + raw —
            # `extraA == needs[0]` ⇔ raw == 0, same predicate
            as2_child = do_pair & (bp[:, 3] > 0) & (exA == bp[:, 4])
            node_as2 = node_as2.at[ar, nn_i].set(
                jnp.where(choose, as2_child, node_as2[ar, nn_i]))
            node_noop = node_noop.at[ar, nn_i].set(
                jnp.where(choose, ni_noop | p_noop | (commit & ~do_c),
                          node_noop[ar, nn_i]))

            j_pack = jnp.where(free & choose,
                               jnp.where(any_feas, j_star, -1), 0)
            feas_bits = (feasible.astype(jnp.int32) *
                         (1 << jnp.arange(feasible.shape[1]))).sum(axis=1)
            packed = jnp.concatenate(
                [topo_logits[:, None], choose.astype(jnp.float32)[:, None],
                 scores, cls_k.astype(jnp.float32),
                 icls_k.astype(jnp.float32),
                 j_pack.astype(jnp.float32)[:, None],
                 new_ilab.astype(jnp.float32)[:, None],
                 feas_bits.astype(jnp.float32)[:, None]], axis=1)
            return (state, clab, ilab, slot_used, atom_fv, slot_atom,
                    atom_cnt, node_as2, node_noop, in_deg, agraph, down_row,
                    stack, sp, nxt), packed

        carry0 = (state, clab, ilab, slot_used, atom_fv, slot_atom, atom_cnt,
                  node_as2, node_noop, in_deg, agraph, down_row, stack, sp,
                  nxt)
        # EARLY-TERMINATING loop (not lax.scan): the T budget is a worst
        # case, but every sample's stack usually empties long before it —
        # once all sp hit 0 the remaining iterations of a scan would burn
        # full step cost for bit-identical no-ops.  A while_loop stops at
        # the batch's true max decode length; packed rows past it stay
        # zero (choose=0), which every consumer treats as "finished"
        # (the replay walks its own stack and stops at the same step the
        # device's sp hit 0; the rung depth-simulation decrements on
        # choose=0 rows).
        packed0 = jnp.zeros((T, batch_size, 5 + 3 * beam), jnp.float32)

        def loop_cond(st):
            t, carry, _ = st
            return (t < T) & jnp.any(carry[13] > 0)

        def loop_body(st):
            t, carry, packed = st
            inputs = (t, u_seq[t], pin_op[t], pin_clab[t], pin_ilab[t])
            carry, row = step(carry, inputs)
            packed = jax.lax.dynamic_update_slice(packed, row[None],
                                                  (t, 0, 0))
            return t + 1, carry, packed

        _, _, packed = jax.lax.while_loop(
            loop_cond, loop_body,
            (jnp.asarray(0, jnp.int32), carry0, packed0))
        return packed, root_cls, root_icls
