"""Hierarchical (3-level) autoregressive decoder — teacher-forced training.

TPU-first redesign of the reference ``HierMPNDecoder.forward``
(/root/reference/ggpm/decoder.py:166-284).  Same scan architecture as the
motif decoder (see ``ggpm_tpu.models.decoder``), extended with the atom-level
incremental message passing: the scan carry holds message state for all three
levels plus persistent atom/attachment node-hidden buffers, and each step

1. runs ``diterG`` graph-cell rounds on the atom-graph edges unmasked at the
   previous step (the newly attached cluster) and refreshes those atoms'
   hidden vectors;
2. embeds the frontier attachment node from the refreshed atom hiddens and
   runs ``diterT`` inter-cell rounds on the step's tree message;
3. embeds the frontier motif node from the refreshed attachment hiddens and
   runs ``diterT`` tree-cell rounds, producing topology / motif prediction
   vectors;
4. scores assembly candidates against the *current* atom hiddens
   (``enum_attach``, reference decoder.py:286-301 — unlike the motif decoder
   this is candidate-dependent), emitting per-event cross-entropy terms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.mol_graph import MAX_POS
from ..ops import gather_nd, nei_sum
from .decoder import PredictionMLP, attend, scope_mask
from .encoder import pos_onehot
from .rnn import make_cell


class HierDecoder(nn.Module):
    hvocab_size: int
    ivocab_size: int
    atom_vocab_size: int
    rnn_type: str = 'LSTM'
    embed_size: int = 250
    hidden_size: int = 250
    latent_size: int = 24
    diterT: int = 1
    diterG: int = 3
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
        h = self.hidden_size
        # three incremental levels (IncHierMPNEncoder, encoder.py:182-249)
        self.tree_rnn = make_cell(self.rnn_type, h, self.diterT)
        self.inter_rnn = make_cell(self.rnn_type, h, self.diterT)
        self.graph_rnn = make_cell(self.rnn_type, h, self.diterG)
        self.W_tree_node = nn.Dense(h)    # tree IncMPNEncoder.W_o
        self.W_inter_node = nn.Dense(h)   # inter IncMPNEncoder.W_o
        self.W_graph_node = nn.Dense(h)   # graph IncMPNEncoder.W_o
        self.W_c = nn.Dense(h)            # motif embed
        self.W_i = nn.Dense(h)            # attachment embed
        # prediction heads (reference decoder.py:35-57)
        self.topoNN = PredictionMLP(hidden_size=h, out_size=1, dropout=self.dropout)
        self.clsNN = PredictionMLP(hidden_size=h, out_size=self.hvocab_size,
                                   dropout=self.dropout)
        self.iclsNN = PredictionMLP(hidden_size=h, out_size=self.ivocab_size,
                                    dropout=self.dropout)
        self.matchNN = nn.Dense(h)        # input hidden + embed + MAX_POS
        self.W_assm = nn.Dense(self.latent_size)
        if self.latent_size != self.hidden_size:
            self.W_root = nn.Dense(self.hidden_size)
        if self.use_attention:
            # attention context heads (reference decoder.py:62-65); topo/cls
            # attend over the motif-level source memory, assm over the
            # atom-level one (src_tree_vecs / src_graph_vecs split,
            # decoder.py:136-164)
            self.A_topo = nn.Dense(self.latent_size)
            self.A_cls = nn.Dense(self.latent_size)
            self.A_assm = nn.Dense(self.latent_size)

    def _ec(self):
        return self.E_c if self.E_c is not None else self.E_c_mod

    def _ei(self):
        return self.E_i if self.E_i is not None else self.E_i_mod

    def root_vecs_to_hidden(self, root_vecs):
        if self.latent_size != self.hidden_size:
            return self.W_root(root_vecs)
        return root_vecs

    def _graph_inputs(self, graph):
        """Static atom-level message inputs (embed_graph, encoder.py:119-126)."""
        fnode, fmess = graph['fnode'], graph['fmess']
        hnode = jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[fnode]
        hmess = jnp.concatenate([
            gather_nd(hnode, fmess[:, 0]),
            jnp.eye(4, dtype=jnp.float32)[jnp.clip(fmess[:, 2], 0, 3)],
            pos_onehot(fmess[:, 3])], axis=-1)
        return hnode, hmess

    def __call__(self, tree: Dict[str, Any], graph: Dict[str, Any],
                 plan: Dict[str, Any], root_vecs: jnp.ndarray,
                 vocab_mask: jnp.ndarray, deterministic: bool = True,
                 src_tree_mem=None, src_graph_mem=None):
        fnode, fmess = tree['fnode'], tree['fmess']
        agraph_dec, bgraph_dec = tree['agraph_dec'], tree['bgraph_dec']
        agraph, bgraph = tree['agraph'], tree['bgraph']
        cgraph = tree['cgraph']
        g_agraph, g_bgraph = graph['agraph'], graph['bgraph']
        num_mess = fmess.shape[0]
        num_gmess = graph['fmess'].shape[0]
        num_gnodes = graph['fnode'].shape[0]
        num_tnodes = fnode.shape[0]
        batch_size = root_vecs.shape[0]
        H = self.hidden_size

        att = self.use_attention and src_tree_mem is not None
        if att:
            tmask = scope_mask(tree['scope'], src_tree_mem.shape[0])
            gmask = scope_mask(graph['scope'], src_graph_mem.shape[0])

        init_vecs = self.root_vecs_to_hidden(root_vecs)
        ec_emb = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        ei_emb = self.drop(self._ei()(fnode[:, 1]), deterministic=deterministic)
        g_hnode, g_hmess_in = self._graph_inputs(graph)
        pos_tab = pos_onehot(fmess[:, 2])

        tree_state = self.tree_rnn.init_state(num_mess, init_vecs)
        # vzero ties the zero-initialised carries to the (possibly
        # device-varying) latent so the scan carry type is stable under
        # shard_map (unvarying-in / varying-out carries are rejected)
        vzero = root_vecs[0, 0] * 0.0
        inter_state = tuple(s + vzero for s in self.inter_rnn.init_state(num_mess))
        graph_state = tuple(s + vzero for s in self.graph_rnn.init_state(num_gmess))
        hatom = jnp.zeros((num_gnodes, H)) + vzero
        hinter_node = jnp.zeros((num_tnodes, H)) + vzero

        if self.is_initializing():
            nei_t = tuple(jnp.zeros((1, bgraph_dec.shape[1], H)) for _ in tree_state)
            nei_g = tuple(jnp.zeros((1, g_bgraph.shape[1], H)) for _ in graph_state)
            self.tree_rnn.cell(jnp.zeros((1, H + MAX_POS)), nei_t)
            self.inter_rnn.cell(jnp.zeros((1, H + MAX_POS)), nei_t)
            self.graph_rnn.cell(g_hmess_in[:1], nei_g)
            self.W_graph_node(jnp.zeros((1, self.atom_vocab_size + H)))
            self.W_inter_node(jnp.zeros((1, 2 * H)))
            self.W_tree_node(jnp.zeros((1, 2 * H)))
            self.W_i(jnp.zeros((1, self.embed_size + H)))
            self.W_c(jnp.zeros((1, self.embed_size + H)))
            self.matchNN(jnp.zeros((1, H + self.embed_size + MAX_POS)))
            self.W_assm(jnp.zeros((1, H)))
            if self.use_attention:
                # A_assm is applied inside the scan step; params must exist
                # before the scan is traced
                self.A_assm(jnp.zeros((1, H)))

        def sparse_update(rnn, state, rows, x, bg, n_iter):
            valid = (rows > 0)
            for _ in range(n_iter):
                # compose the index first (gather [rows, nb, H], not the
                # whole [M, nb, H] table) — see MotifDecoder._run_scan
                nei = tuple(gather_nd(s, bg[rows]) for s in state)
                new = rnn.cell(x, nei)
                # invalid lanes target row 0 and write 0.0 — one masked
                # scatter, no gather or row0 fixup needed
                state = tuple(
                    s.at[rows].set(jnp.where(valid[..., None], nr, 0.0))
                    for s, nr in zip(state, new))
            return state

        def step(carry, inputs):
            (tree_state, inter_state, graph_state, hatom, hinter_node) = carry
            (rows, x_nodes, g_rows, g_nodes, cands, cand_ok, icls_ids,
             n_icls, nth) = inputs

            # --- 1. atom level: process previous step's cluster -----------
            gr = g_rows.reshape(-1)
            graph_state = sparse_update(
                self.graph_rnn, graph_state, gr, g_hmess_in[gr], g_bgraph,
                self.diterG)
            gh = self.graph_rnn.hidden(graph_state)
            gn = g_nodes.reshape(-1)
            g_node_h = nn.relu(self.W_graph_node(jnp.concatenate(
                [g_hnode[gn], nei_sum(gh, g_agraph[gn])], axis=-1)))
            hatom = hatom.at[gn].set(
                jnp.where((gn > 0)[:, None], g_node_h, 0.0))

            # --- 2. attachment (inter) level ------------------------------
            src = fmess[rows, 0]
            hclu = nei_sum(hatom, cgraph[src])
            inter_embed_src = nn.relu(self.W_i(jnp.concatenate(
                [ei_emb[src], hclu], axis=-1)))
            x_i = jnp.concatenate([inter_embed_src, pos_tab[rows]], axis=-1)
            inter_state = sparse_update(self.inter_rnn, inter_state, rows,
                                        x_i, bgraph, self.diterT)
            ih = self.inter_rnn.hidden(inter_state)
            hclu_x = nei_sum(hatom, cgraph[x_nodes])
            inter_embed_x = nn.relu(self.W_i(jnp.concatenate(
                [ei_emb[x_nodes], hclu_x], axis=-1)))
            inter_node_h = nn.relu(self.W_inter_node(jnp.concatenate(
                [inter_embed_x, nei_sum(ih, agraph[x_nodes])], axis=-1)))
            hinter_node = hinter_node.at[x_nodes].set(
                jnp.where((x_nodes > 0)[:, None], inter_node_h, 0.0))

            # --- 3. motif (tree) level ------------------------------------
            tree_embed_src = nn.relu(self.W_c(jnp.concatenate(
                [ec_emb[src], hinter_node[src]], axis=-1)))
            x_t = jnp.concatenate([tree_embed_src, pos_tab[rows]], axis=-1)
            tree_state = sparse_update(self.tree_rnn, tree_state, rows, x_t,
                                       bgraph_dec, self.diterT)
            th = self.tree_rnn.hidden(tree_state)
            tree_embed_x = nn.relu(self.W_c(jnp.concatenate(
                [ec_emb[x_nodes], hinter_node[x_nodes]], axis=-1)))
            topo_vec = nn.relu(self.W_tree_node(jnp.concatenate(
                [tree_embed_x, nei_sum(th, agraph_dec[x_nodes])], axis=-1)))
            cls_vec = th[rows]

            # --- 4. assembly candidate vectors ----------------------------
            # cand atoms [B, C, 2] → matchNN([hatom, E_i(icls), pos]) summed
            # over the anchor pair (reference enum_attach, decoder.py:286-301)
            cand_h = hatom[cands]                          # [B, C, 2, H]
            icls_e = self.drop(self._ei()(icls_ids),
                               deterministic=True)         # [B, 2, E]
            icls_e = jnp.broadcast_to(icls_e[:, None], cand_h.shape[:3] + (self.embed_size,))
            pos_e = pos_onehot(nth)[:, None, None, :]
            pos_e = jnp.broadcast_to(pos_e, cand_h.shape[:3] + (MAX_POS,))
            mvec = nn.relu(self.matchNN(jnp.concatenate(
                [cand_h, icls_e, pos_e], axis=-1)))        # [B, C, 2, H]
            k_mask = (jnp.arange(2)[None, None, :] < n_icls[:, None, None])
            cand_vecs = (mvec * k_mask[..., None]).sum(axis=2)   # [B, C, H]
            cand_vecs = cand_vecs * cand_ok[..., None]
            if att:
                # per-candidate attention over atom-level source memory
                # (get_assm_score with use_attention, decoder.py:159-164)
                proj = self.A_assm(cand_vecs)                # [B, C, latent]
                sc = jnp.einsum('nl,bcl->bcn', src_graph_mem, proj)
                sc = jnp.where(gmask[:, None, :], sc,
                               jnp.finfo(sc.dtype).min / 4)
                assm_ctx = jnp.einsum('bcn,nl->bcl',
                                      jax.nn.softmax(sc, -1), src_graph_mem)
            else:
                assm_ctx = root_vecs[:, None, :]
            cand_scores = (self.W_assm(cand_vecs) * assm_ctx).sum(-1)  # [B, C]

            carry = (tree_state, inter_state, graph_state, hatom, hinter_node)
            return carry, (topo_vec, cls_vec, cand_scores)

        carry = (tree_state, inter_state, graph_state, hatom, hinter_node)
        xs = (plan['mess'], plan['xid'], plan['gstep_mess'],
              plan['gstep_nodes'], plan['assm_cands'], plan['assm_cand_ok'],
              plan['assm_icls'], plan['assm_n_icls'], plan['assm_nth'])
        step_fn = jax.checkpoint(step) if self.remat else step
        _, (topo_vecs, cls_vecs, cand_scores) = jax.lax.scan(step_fn, carry, xs)

        # ---- losses (identical head structure to the motif decoder) ------
        T = topo_vecs.shape[0]
        active = plan['active']
        latent_b = jnp.broadcast_to(root_vecs[None],
                                    (T, batch_size, self.latent_size))

        if att:
            topo_ctx = attend(src_tree_mem, tmask, topo_vecs, self.A_topo)
            root_cls_ctx = attend(src_tree_mem, tmask, init_vecs, self.A_cls)
            step_cls_ctx = attend(src_tree_mem, tmask, cls_vecs, self.A_cls)
        else:
            topo_ctx = latent_b
            root_cls_ctx = root_vecs
            step_cls_ctx = latent_b

        topo_logits = self.topoNN(
            jnp.concatenate([topo_vecs, topo_ctx], axis=-1),
            deterministic)[..., 0]
        tlab = plan['tlab'].astype(jnp.float32)
        topo_bce = jnp.maximum(topo_logits, 0) - topo_logits * tlab + \
            jnp.log1p(jnp.exp(-jnp.abs(topo_logits)))
        act_f = active.astype(jnp.float32)
        topo_loss = (topo_bce * act_f).sum()
        topo_acc = (((topo_logits >= 0).astype(jnp.int32) == plan['tlab'])
                    * active).sum() / jnp.maximum(active.sum(), 1)

        def heads(vec, ctx):
            x = jnp.concatenate([vec, ctx], axis=-1)
            return self.clsNN(x, deterministic), self.iclsNN(x, deterministic)

        root_cls_logits, root_icls_logits = heads(init_vecs, root_cls_ctx)
        step_cls_logits, step_icls_logits = heads(cls_vecs, step_cls_ctx)
        root_icls_logits = root_icls_logits + vocab_mask[plan['root_clab']]
        step_icls_logits = step_icls_logits + vocab_mask[plan['clab']]

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
        cls_acc = ((jnp.argmax(root_cls_logits, -1) == plan['root_clab']).sum()
                   + ((jnp.argmax(step_cls_logits, -1) == plan['clab'])
                      * plan['has_cls']).sum()) / n_cls
        icls_acc = ((jnp.argmax(root_icls_logits, -1) == plan['root_ilab']).sum()
                    + ((jnp.argmax(step_icls_logits, -1) == plan['ilab'])
                       * plan['has_cls']).sum()) / n_cls

        # assembly CE over [real candidate slots] + [zero-vector pad slots]
        bias = self.W_assm(jnp.zeros((self.hidden_size,)))
        if att:
            pad_ctx = attend(src_graph_mem, gmask,
                             jnp.zeros((batch_size, self.hidden_size)),
                             self.A_assm)
            p_score = (bias * pad_ctx).sum(-1)[None, :]        # [1, B]
        else:
            p_score = (bias * root_vecs).sum(-1)[None, :]      # [1, B]
        nc = plan['assm_nc'].astype(jnp.float32)
        maxc = plan['max_cls_size'].astype(jnp.float32)
        neg = jnp.finfo(jnp.float32).min / 4
        masked = jnp.where(plan['assm_cand_ok'], cand_scores, neg)
        m = jnp.maximum(jnp.max(masked, axis=-1), p_score)
        real_sum = (jnp.exp(masked - m[..., None]) *
                    plan['assm_cand_ok']).sum(-1)
        lse = jnp.log(real_sum + jnp.maximum(maxc - nc, 0.0)
                      * jnp.exp(p_score - m) + 1e-12) + m
        gold = cand_scores[..., 0]
        has_assm = plan['has_assm'].astype(jnp.float32)
        assm_loss = ((lse - gold) * has_assm).sum()
        best = jnp.max(jnp.where(plan['assm_cand_ok'], cand_scores, neg), -1)
        best = jnp.maximum(best, jnp.where(nc >= maxc, neg, p_score))
        assm_correct = gold >= best
        assm_acc = jnp.where(
            has_assm.sum() > 0,
            (assm_correct * plan['has_assm']).sum() /
            jnp.maximum(plan['has_assm'].sum(), 1), 1.0)

        loss = (topo_loss + cls_loss + icls_loss + assm_loss) / batch_size
        return loss, {'Word': cls_acc, 'I-Word': icls_acc, 'Topo': topo_acc,
                      'Assm': assm_acc}

    # -- autoregressive decode step functions ------------------------------
    # Mirrors the two IncHierMPNEncoder calls per reference decode step
    # (decoder.py:367-399) with graph bookkeeping host-side; all index tables
    # are passed per call as fixed-width arrays.

    def _sparse_direct(self, rnn, state, rows, x, bg_rows, n_iter):
        """Cell application on explicit rows with explicit predecessor-row
        tables (decode-time variant of the scan's sparse update).

        The x-side gate projections are loop-invariant, so they are hoisted
        out of the iteration loop via the cells' split-step API (x_proj /
        k_h / step — the same linearity restructure the dense forward
        uses): for diterG=3 this removes 2/3 of the full-width gate
        matmuls from the propose scan's per-step atom refresh.  Both
        decode paths (exact hdec_* and hdec_propose) share this helper,
        so turbo-vs-exact equivalence is unaffected."""
        valid = (rows > 0)
        xp = rnn.x_proj(x)
        ks = rnn.k_h()
        for _ in range(n_iter):
            nei = tuple(s[bg_rows] for s in state)
            new = rnn.step(xp, nei, ks)
            # invalid lanes target row 0 and write 0.0 — one masked scatter
            # (saves a gather + a row0 scatter per state element per iter;
            # the propose scans call this 3x per step)
            state = tuple(
                s.at[rows].set(jnp.where(valid[..., None], nr, 0.0))
                for s, nr in zip(state, new))
        return state

    def _sparse_local(self, rnn, state, rows, x, bg_rows, n_iter):
        """Bit-exact ``_sparse_direct`` with the full-state traffic hoisted
        out of the iteration loop.  Only ``rows`` change across iterations,
        so (a) neighbor contributions from rows OUTSIDE the update set are
        constant — gathered from the full state ONCE, not per iteration —
        and (b) the full-state scatter happens once at the end instead of
        every iteration.  The per-iteration gathers then read a [R, H]
        local buffer instead of the [1+B·Eg, H] table: the TPU trace of
        one warm hier propose (runs/HIER_TRACE_report.json) shows the
        in-loop variant's per-iteration scatters each copy the full 46 MB
        state — the propose scan's single largest cost after the gathers.
        In-set membership is detected by a scatter/round-trip check (row 0
        collisions are masked by ``bg > 0``)."""
        valid = rows > 0
        R = rows.shape[0]
        n_all = state[0].shape[0]
        loc_of = jnp.zeros((n_all,), jnp.int32).at[rows].set(
            jnp.arange(R, dtype=jnp.int32), mode='drop')
        lbg = loc_of[bg_rows]                              # [R, NB]
        member = (rows[lbg] == bg_rows) & (bg_rows > 0)
        nei_out = tuple(
            jnp.where(member[..., None], 0.0, s[bg_rows]) for s in state)
        local = tuple(s[rows] for s in state)
        xp = rnn.x_proj(x)
        ks = rnn.k_h()
        for _ in range(n_iter):
            nei = tuple(jnp.where(member[..., None], lo[lbg], out)
                        for lo, out in zip(local, nei_out))
            new = rnn.step(xp, nei, ks)
            local = tuple(jnp.where(valid[..., None], nr, lo)
                          for lo, nr in zip(local, new))
        return tuple(
            s.at[rows].set(jnp.where(valid[..., None], lo, 0.0))
            for s, lo in zip(state, local))

    def hdec_init(self, n_tree_rows: int, n_graph_rows: int, n_gnodes: int,
                  n_tnodes: int, root_vecs):
        init = self.root_vecs_to_hidden(root_vecs)
        b = init.shape[0]
        tree_state = self.tree_rnn.init_state(n_tree_rows)
        tree_state = (tree_state[0].at[1:b + 1].set(init),) + tuple(tree_state[1:])
        inter_state = self.inter_rnn.init_state(n_tree_rows)
        graph_state = self.graph_rnn.init_state(n_graph_rows)
        hatom = jnp.zeros((n_gnodes, self.hidden_size))
        hinter_node = jnp.zeros((n_tnodes, self.hidden_size))
        return (tree_state, inter_state, graph_state, hatom, hinter_node)

    def _g_mess_input(self, src_av, bt, nth):
        return jnp.concatenate([
            jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[src_av],
            jnp.eye(4, dtype=jnp.float32)[jnp.clip(bt, 0, 3)],
            pos_onehot(nth)], axis=-1)

    def hdec_graph_update(self, state, g_rows, g_src_av, g_bt, g_nth,
                          g_bg_rows, g_nodes, g_node_av, g_ag_rows):
        """Atom-level refresh of the frontier clusters (reference decode
        subgraph pass)."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        flat = g_rows.reshape(-1)
        x = self._g_mess_input(g_src_av.reshape(-1), g_bt.reshape(-1),
                               g_nth.reshape(-1))
        graph_s = self._sparse_direct(self.graph_rnn, graph_s, flat, x,
                                      g_bg_rows.reshape(-1, g_bg_rows.shape[-1]),
                                      self.diterG)
        gh = self.graph_rnn.hidden(graph_s)
        gn = g_nodes.reshape(-1)
        hn = jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[g_node_av.reshape(-1)]
        node_h = nn.relu(self.W_graph_node(jnp.concatenate(
            [hn, gh[g_ag_rows.reshape(-1, g_ag_rows.shape[-1])].sum(axis=-2)],
            axis=-1)))
        hatom = hatom.at[gn].set(
            jnp.where((gn > 0)[:, None], node_h, 0.0))
        return (tree_s, inter_s, graph_s, hatom, hinter_node)

    def hdec_topo(self, state, v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                  root_vecs):
        """Frontier 3-level node readout + topology logits; also refreshes
        the attachment-node buffer used by subsequent message embedding."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        hclu = hatom[v_cgraph].sum(axis=-2)
        inter_emb = nn.relu(self.W_i(jnp.concatenate(
            [self._ei()(v_ilab), hclu], axis=-1)))
        ih = self.inter_rnn.hidden(inter_s)
        inter_node = nn.relu(self.W_inter_node(jnp.concatenate(
            [inter_emb, ih[v_ag_rows].sum(axis=-2)], axis=-1)))
        hinter_node = hinter_node.at[v_nodes].set(
            jnp.where((v_nodes > 0)[:, None], inter_node, 0.0))
        tree_emb = nn.relu(self.W_c(jnp.concatenate(
            [self._ec()(v_clab), inter_node], axis=-1)))
        th = self.tree_rnn.hidden(tree_s)
        tree_node = nn.relu(self.W_tree_node(jnp.concatenate(
            [tree_emb, th[v_ag_rows].sum(axis=-2)], axis=-1)))
        logits = self.topoNN(jnp.concatenate([tree_node, root_vecs], axis=-1),
                             True)[..., 0]
        state = (tree_s, inter_s, graph_s, hatom, hinter_node)
        return state, logits

    def hdec_mess_update(self, state, rows, src_nodes, src_clab, src_ilab,
                         src_cgraph, pos, inter_bg_rows, tree_bg_rows):
        """Compute inter- and tree-level messages for this step's new edges."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        hclu = hatom[src_cgraph].sum(axis=-2)
        inter_emb = nn.relu(self.W_i(jnp.concatenate(
            [self._ei()(src_ilab), hclu], axis=-1)))
        x_i = jnp.concatenate([inter_emb, pos_onehot(pos)], axis=-1)
        inter_s = self._sparse_direct(self.inter_rnn, inter_s, rows, x_i,
                                      inter_bg_rows, self.diterT)
        tree_emb = nn.relu(self.W_c(jnp.concatenate(
            [self._ec()(src_clab), hinter_node[src_nodes]], axis=-1)))
        x_t = jnp.concatenate([tree_emb, pos_onehot(pos)], axis=-1)
        tree_s = self._sparse_direct(self.tree_rnn, tree_s, rows, x_t,
                                     tree_bg_rows, self.diterT)
        return (tree_s, inter_s, graph_s, hatom, hinter_node)

    def hdec_cls(self, state, rows, root_vecs):
        th = self.tree_rnn.hidden(state[0])
        x = jnp.concatenate([th[rows], root_vecs], axis=-1)
        return self.clsNN(x, True), self.iclsNN(x, True)

    # fused variants: one device call per decode half-step (the hier decode
    # is roundtrip-latency-bound; see decode.HierDecodeKernel)
    def hdec_graph_topo(self, state, g_rows, g_src_av, g_bt, g_nth,
                        g_bg_rows, g_nodes, g_node_av, g_ag_rows,
                        v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                        root_vecs):
        state = self.hdec_graph_update(state, g_rows, g_src_av, g_bt, g_nth,
                                       g_bg_rows, g_nodes, g_node_av,
                                       g_ag_rows)
        return self.hdec_topo(state, v_nodes, v_clab, v_ilab, v_cgraph,
                              v_ag_rows, root_vecs)

    def hdec_mess_cls_topk(self, state, rows, src_nodes, src_clab, src_ilab,
                           src_cgraph, pos, inter_bg_rows, tree_bg_rows,
                           root_vecs, vocab_mask, beam: int):
        from .decode import hier_topk
        state = self.hdec_mess_update(state, rows, src_nodes, src_clab,
                                      src_ilab, src_cgraph, pos,
                                      inter_bg_rows, tree_bg_rows)
        cls_scores, icls_scores = self.hdec_cls(state, rows, root_vecs)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        return state, scores, cls_k, icls_k

    def hdec_step_fused(self, state, g_rows, g_src_av, g_bt, g_nth,
                        g_bg_rows, g_nodes, g_node_av, g_ag_rows,
                        v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                        can_expand, u, new_rows, exp_bg_rows,
                        bt_valid, bt_pos, bt_bg_rows,
                        root_vecs, vocab_mask, beam: int):
        """ONE device call per hier decode step: atom-level refresh of the
        previous step's cluster + frontier topology + speculative message
        update + motif top-k (see MotifDecoder.dec_step_fused for the
        branch-selection rationale; in the hier tree both branches share the
        frontier as message source, only position and predecessor rows
        differ)."""
        from .decode import hier_topk
        state = self.hdec_graph_update(state, g_rows, g_src_av, g_bt, g_nth,
                                       g_bg_rows, g_nodes, g_node_av,
                                       g_ag_rows)
        state, topo_logits = self.hdec_topo(state, v_nodes, v_clab, v_ilab,
                                            v_cgraph, v_ag_rows, root_vecs)
        choose = (jax.nn.sigmoid(topo_logits) > u) & can_expand
        valid = choose | bt_valid
        rows = jnp.where(valid, new_rows, 0)
        pos = jnp.where(choose, 0, bt_pos)
        bg = jnp.where(choose[:, None], exp_bg_rows, bt_bg_rows)
        state = self.hdec_mess_update(state, rows, v_nodes, v_clab, v_ilab,
                                      v_cgraph, pos, bg, bg)
        cls_scores, icls_scores = self.hdec_cls(state, rows, root_vecs)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        # pack host-bound outputs into ONE array — one tunnel RTT per step
        packed = jnp.concatenate(
            [topo_logits[:, None], choose.astype(jnp.float32)[:, None],
             scores, cls_k.astype(jnp.float32),
             icls_k.astype(jnp.float32)], axis=1)
        return state, packed

    def hdec_assm(self, state, cand_atoms, icls_ids, n_icls, nth, ctx):
        """Per-candidate assembly scores against current atom hiddens
        (reference enum_attach + get_assm_score in decode,
        decoder.py:436-443)."""
        hatom = state[3]
        cand_h = hatom[cand_atoms]                         # [C, 2, H]
        icls_e = self._ei()(icls_ids)                      # [2, E]
        icls_e = jnp.broadcast_to(icls_e[None], cand_h.shape[:2] + (self.embed_size,))
        pos_e = jnp.broadcast_to(pos_onehot(nth)[None, None],
                                 cand_h.shape[:2] + (MAX_POS,))
        mvec = nn.relu(self.matchNN(jnp.concatenate(
            [cand_h, icls_e, pos_e], axis=-1)))
        k_mask = (jnp.arange(2)[None, :] < n_icls)[..., None]
        cand_vecs = (mvec * k_mask).sum(axis=1)            # [C, H]
        return (self.W_assm(cand_vecs) * ctx[None]).sum(-1)

    # -- device-resident speculative decode (turbo) -------------------------

    def _graft_rows(self, tabs, carry, b_of, new_ilab, ch_atom_f, do_c,
                    nth_edge, skip_anchor, nn_flat, Eg, NBG, KE):
        """Apply one graft's atom-level row bookkeeping (device counterpart
        of IncGraph.add_mol's bond loop, inc_graph.py:180-196): allocate two
        directed message rows per NEW motif bond, mirror add_edge's
        agraph/bgraph maintenance (including the retroactive predecessor
        updates), and record the new node's cluster edge rows.

        carry: (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
        out_cnt, edge_cnt, clist, ccnt) — all flat-indexed; ``ch_atom_f``
        [B, S] flat atom ids of the child's slots; ``skip_anchor`` [B] the
        anchor-pair bond already exists in the parent."""
        (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
         out_cnt, edge_cnt, clist, ccnt) = carry
        B = do_c.shape[0]
        ar = jnp.arange(B)
        nbond = tabs['nbond'][new_ilab]                       # [B]
        # hoisted per-child tables: ONE gather each for the whole loop
        # instead of 4 vocab gathers + 2 dst_att gathers per iteration
        bonds = tabs['bondpack'][new_ilab]                    # [B, BMAX, 4]
        d_att = tabs['dst_att'][new_ilab]                     # [B, S]

        def bond_step(k, c):
            (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
             out_cnt, edge_cnt, clist, ccnt) = c
            on = do_c & (k < nbond)
            bk = bonds[:, k]                                  # dynamic_slice
            a_s, b_s, bt = bk[:, 0], bk[:, 1], bk[:, 2]
            anch = bk[:, 3].astype(bool) & skip_anchor
            add = on & (~anch)
            u = jnp.take_along_axis(ch_atom_f, a_s[:, None], 1)[:, 0]
            w = jnp.take_along_axis(ch_atom_f, b_s[:, None], 1)[:, 0]
            e1 = jnp.where(add, 1 + b_of + edge_cnt, 0)
            e2 = jnp.where(add, 1 + b_of + edge_cnt + 1, 0)

            # row content (fmess: src av, bond type, nth-if-dst-attached)
            d_att_b = jnp.take_along_axis(d_att, b_s[:, None], 1)[:, 0]
            d_att_a = jnp.take_along_axis(d_att, a_s[:, None], 1)[:, 0]
            e_av = e_av.at[e1].set(jnp.where(add, a_av[u], e_av[e1]))
            e_av = e_av.at[e2].set(jnp.where(add, a_av[w], e_av[e2]))
            e_bt = e_bt.at[e1].set(jnp.where(add, bt, e_bt[e1]))
            e_bt = e_bt.at[e2].set(jnp.where(add, bt, e_bt[e2]))
            e_nth = e_nth.at[e1].set(
                jnp.where(add & d_att_b, nth_edge, jnp.where(add, 0, e_nth[e1])))
            e_nth = e_nth.at[e2].set(
                jnp.where(add & d_att_a, nth_edge, jnp.where(add, 0, e_nth[e2])))

            # bgraph of the new rows: current in-rows of their SOURCE atom
            # (the reverse edge cannot exist yet — an existing bond skips
            # row creation entirely)
            e_bg = e_bg.at[e1].set(jnp.where(add[:, None], in_g[u], e_bg[e1]))
            e_bg = e_bg.at[e2].set(jnp.where(add[:, None], in_g[w], e_bg[e2]))

            # retroactive updates: existing OUT-edges of the dst gain the
            # new row at slot (new in-degree − 2)  (add_edge, inc_graph.py:82-86)
            slot_w = jnp.clip(in_cnt[w] - 1, 0, NBG - 1)
            rows_w = out_g[w]                                  # [B, NBG]
            m_w = add[:, None] & (rows_w > 0) & (out_dst[w] != u[:, None])
            tgt_w = jnp.where(m_w, rows_w, 0)
            e_bg = e_bg.at[tgt_w, slot_w[:, None]].set(
                jnp.where(m_w, e1[:, None], e_bg[tgt_w, slot_w[:, None]]))
            slot_u = jnp.clip(in_cnt[u] - 1, 0, NBG - 1)
            rows_u = out_g[u]
            m_u = add[:, None] & (rows_u > 0) & (out_dst[u] != w[:, None])
            tgt_u = jnp.where(m_u, rows_u, 0)
            e_bg = e_bg.at[tgt_u, slot_u[:, None]].set(
                jnp.where(m_u, e2[:, None], e_bg[tgt_u, slot_u[:, None]]))
            e_bg = e_bg.at[0].set(0)

            # append to in/out lists (slot order = host append order)
            s_in_w = jnp.clip(in_cnt[w], 0, NBG - 1)
            in_g = in_g.at[w, s_in_w].set(jnp.where(add, e1, in_g[w, s_in_w]))
            s_in_u = jnp.clip(in_cnt[u], 0, NBG - 1)
            in_g = in_g.at[u, s_in_u].set(jnp.where(add, e2, in_g[u, s_in_u]))
            s_out_u = jnp.clip(out_cnt[u], 0, NBG - 1)
            out_g = out_g.at[u, s_out_u].set(
                jnp.where(add, e1, out_g[u, s_out_u]))
            out_dst = out_dst.at[u, s_out_u].set(
                jnp.where(add, w, out_dst[u, s_out_u]))
            s_out_w = jnp.clip(out_cnt[w], 0, NBG - 1)
            out_g = out_g.at[w, s_out_w].set(
                jnp.where(add, e2, out_g[w, s_out_w]))
            out_dst = out_dst.at[w, s_out_w].set(
                jnp.where(add, u, out_dst[w, s_out_w]))
            in_cnt = in_cnt.at[w].add(add.astype(jnp.int32))
            in_cnt = in_cnt.at[u].add(add.astype(jnp.int32))
            out_cnt = out_cnt.at[u].add(add.astype(jnp.int32))
            out_cnt = out_cnt.at[w].add(add.astype(jnp.int32))
            in_g = in_g.at[0].set(0)
            out_g = out_g.at[0].set(0)
            out_dst = out_dst.at[0].set(0)
            in_cnt = in_cnt.at[0].set(0)
            out_cnt = out_cnt.at[0].set(0)

            # pre-existing anchor bond: reuse its rows (add_mol's edge_dict
            # lookup, inc_graph.py:196) — find them in u's out list by dst
            reuse = on & anch
            fwd_hit = (out_dst[u] == w[:, None]) & (out_g[u] > 0)
            r1 = (out_g[u] * fwd_hit).max(axis=-1)
            rev_hit = (out_dst[w] == u[:, None]) & (out_g[w] > 0)
            r2 = (out_g[w] * rev_hit).max(axis=-1)
            c1 = jnp.where(add, e1, jnp.where(reuse, r1, 0))
            c2 = jnp.where(add, e2, jnp.where(reuse, r2, 0))
            sl = jnp.clip(ccnt[ar, nn_flat], 0, KE - 2)
            rec = on
            clist = clist.at[ar, nn_flat, sl].set(
                jnp.where(rec, c1, clist[ar, nn_flat, sl]))
            clist = clist.at[ar, nn_flat, sl + 1].set(
                jnp.where(rec, c2, clist[ar, nn_flat, sl + 1]))
            ccnt = ccnt.at[ar, nn_flat].add(2 * rec.astype(jnp.int32))
            edge_cnt = edge_cnt + 2 * add.astype(jnp.int32)
            return (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g,
                    out_dst, out_cnt, edge_cnt, clist, ccnt)

        carry = (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
                 out_cnt, edge_cnt, clist, ccnt)
        # dynamic trip bound: iterations with k >= nbond are no-ops for
        # every sample (the ``on`` guard), so truncating at the batch's max
        # active bond count is bit-exact — BMAX is 30 but the median motif
        # has 6 bonds, and backtrack steps (do_c all-False) skip the loop
        # entirely.  This inner loop runs once per decode-scan step, so its
        # trip count multiplies the whole scan's primitive count.
        limit = jnp.max(jnp.where(do_c, nbond, 0))
        return jax.lax.fori_loop(0, limit, bond_step, carry)

    def _graft_rows_vec(self, tabs, carry, b_of, new_ilab, ch_atom_f, do_c,
                        nth_edge, skip_anchor, nn_flat, Eg, NBG, KE):
        """Closed-form (loop-free) equivalent of ``_graft_rows``.

        The sequential bond loop costs ~640 primitives PER BOND inside the
        propose scan's while body (scripts/propose_ops.py) — ~6x the rest
        of the step at the median 6-bond motif.  It can be eliminated
        because add_edge's bookkeeping has a closed form: a directed row
        (u→w)'s final predecessor list is exactly the in-rows of u in
        chronological order minus its own reverse (w→u) — the creation-time
        ``in_g[u]`` copy plus the later bonds' retroactive appends land at
        slots equal to the row's fill level (both equal ``in_cnt[u]-1``
        because every row's view excludes exactly one in-edge).  With
        per-bond exclusive prefix ranks over each atom's incident add-bond
        list, every row id, slot and value is a direct expression, and the
        whole graft becomes ~15 scatters/gathers regardless of bond count.
        Bit-exact vs the loop (tests/test_decode.py::test_graft_rows_vec_
        matches_sequential) as long as no atom exceeds NBG in-rows — which
        the valence model guarantees for non-poisoned samples.
        """
        (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
         out_cnt, edge_cnt, clist, ccnt) = carry
        B = do_c.shape[0]
        ar = jnp.arange(B)
        nbond = tabs['nbond'][new_ilab]                       # [B]
        bonds = tabs['bondpack'][new_ilab]                    # [B, BMAX, 4]
        d_att = tabs['dst_att'][new_ilab]                     # [B, S]
        BMAX = bonds.shape[1]
        S = d_att.shape[1]
        kk = jnp.arange(BMAX)[None, :]
        NE = e_av.shape[0]                                    # OOB sentinel
        NA = in_g.shape[0]

        a_s, b_s, bt = bonds[..., 0], bonds[..., 1], bonds[..., 2]
        anch = bonds[..., 3].astype(bool) & skip_anchor[:, None]
        on = do_c[:, None] & (kk < nbond[:, None])            # [B, BMAX]
        add = on & (~anch)
        u = jnp.take_along_axis(ch_atom_f, a_s, axis=1)       # [B, BMAX]
        w = jnp.take_along_axis(ch_atom_f, b_s, axis=1)

        # edge row ids: e1_k = 1 + b_of + edge_cnt0 + 2·(#add bonds < k)
        add_i = add.astype(jnp.int32)
        e_off = 2 * (jnp.cumsum(add_i, axis=1) - add_i)
        e1 = 1 + b_of[:, None] + edge_cnt[:, None] + e_off
        e2 = e1 + 1

        # ---- pre-graft reads (everything below scatters) -----------------
        c0_in = in_cnt[ch_atom_f]                             # [B, S]
        pre_out_rows = out_g[ch_atom_f]                       # [B, S, NBG]
        pre_out_dst = out_dst[ch_atom_f]
        pre_in = in_g[ch_atom_f]                              # [B, S, NBG]
        av_u = a_av[u]
        av_w = a_av[w]

        # per-slot incident-add structure and exclusive ranks
        sidx = jnp.arange(S)
        inc_a = (a_s[:, None, :] == sidx[None, :, None]) & add[:, None, :]
        inc_b = (b_s[:, None, :] == sidx[None, :, None]) & add[:, None, :]
        incid = inc_a | inc_b                                 # [B, S, BMAX]
        inc_i = incid.astype(jnp.int32)
        rank = jnp.cumsum(inc_i, axis=2) - inc_i              # [B, S, BMAX]
        cnt_s = inc_i.sum(axis=2)                             # [B, S]

        # new in-row id and other-endpoint tables per (slot, rank):
        # bond j contributes in-row e2_j to a_j's atom, e1_j to b_j's
        contrib = jnp.where(inc_a, e2[:, None, :],
                            jnp.where(inc_b, e1[:, None, :], 0))
        oth = jnp.where(inc_a, w[:, None, :],
                        jnp.where(inc_b, u[:, None, :], 0))
        rank_t = jnp.where(incid, jnp.minimum(rank, NBG - 1), NBG)
        # 1-D linear-index scatters: the multi-index form lowers to dense
        # select fusions over the whole table on TPU (runs/
        # HIER_TRACE_report.json); masked lanes use a flat OOB sentinel —
        # never a clamped in-range index, which would alias a live slot
        bsn = (ar[:, None, None] * S + sidx[None, :, None]) * NBG
        lin_r = jnp.where(incid, bsn + jnp.minimum(rank, NBG - 1),
                          B * S * NBG)
        nl = jnp.zeros((B * S * NBG,), jnp.int32).at[lin_r].set(
            contrib, mode='drop').reshape(B, S, NBG)
        ol = jnp.zeros((B * S * NBG,), jnp.int32).at[lin_r].set(
            oth, mode='drop').reshape(B, S, NBG)

        # per-bond views of the per-slot quantities
        take_s = lambda x, s: jnp.take_along_axis(x, s[:, :, None]
                                                  if x.ndim == 3 else s,
                                                  axis=1)
        rank_u = jnp.take_along_axis(
            rank.transpose(0, 2, 1), a_s[:, :, None], axis=2)[..., 0]
        rank_w = jnp.take_along_axis(
            rank.transpose(0, 2, 1), b_s[:, :, None], axis=2)[..., 0]
        c0_u = take_s(c0_in, a_s)
        c0_w = take_s(c0_in, b_s)
        cnt_u = take_s(cnt_s, a_s)
        cnt_w = take_s(cnt_s, b_s)

        # ---- row content: e_av / e_bt / e_nth (one scatter each) ---------
        tgt1 = jnp.where(add, e1, NE).reshape(-1)
        tgt2 = jnp.where(add, e2, NE).reshape(-1)
        t12 = jnp.concatenate([tgt1, tgt2])
        e_av = e_av.at[t12].set(
            jnp.concatenate([av_u.reshape(-1), av_w.reshape(-1)]),
            mode='drop')
        e_bt = e_bt.at[t12].set(
            jnp.concatenate([bt.reshape(-1), bt.reshape(-1)]), mode='drop')
        d_att_b = take_s(d_att, b_s)
        d_att_a = take_s(d_att, a_s)
        nthv = nth_edge[:, None]
        e_nth = e_nth.at[t12].set(jnp.concatenate(
            [jnp.where(d_att_b > 0, nthv, 0).reshape(-1),
             jnp.where(d_att_a > 0, nthv, 0).reshape(-1)]), mode='drop')

        # ---- e_bg content of the new rows (closed form) ------------------
        m = jnp.arange(NBG)[None, None, :]
        nl_u = jnp.take_along_axis(nl, a_s[:, :, None], axis=1)
        nl_w = jnp.take_along_axis(nl, b_s[:, :, None], axis=1)
        pre_u = jnp.take_along_axis(pre_in, a_s[:, :, None], axis=1)
        pre_w = jnp.take_along_axis(pre_in, b_s[:, :, None], axis=1)

        def row_view(pre, c0, nlx, cnt, rk):
            # slot m: pre rows below c0, then the atom's new in-rows in
            # bond order with this bond's own reverse removed
            idx = m - c0[:, :, None]
            idx_adj = idx + (idx >= rk[:, :, None])
            new_v = jnp.take_along_axis(nlx, jnp.clip(idx_adj, 0, NBG - 1),
                                        axis=2)
            new_ok = (idx >= 0) & (idx < cnt[:, :, None] - 1)
            return jnp.where(idx < 0, pre, jnp.where(new_ok, new_v, 0))

        row1 = row_view(pre_u, c0_u, nl_u, cnt_u, rank_u)     # e1 = u→w
        row2 = row_view(pre_w, c0_w, nl_w, cnt_w, rank_w)     # e2 = w→u
        e_bg = e_bg.at[t12].set(
            jnp.concatenate([row1.reshape(-1, NBG), row2.reshape(-1, NBG)]),
            mode='drop')

        # ---- retroactive appends into PRE-EXISTING rows -------------------
        # (uniform over slots: only attach atoms have pre out-rows).  For
        # slot s's r-th incident add-bond, its new in-row nl[s, r] lands in
        # every pre out-row of s (except the row whose dst is that bond's
        # other endpoint) at slot c0_in(s) - 1 + r == the row's fill level.
        rr = jnp.arange(NBG)
        r_ok = rr[None, None, :] < cnt_s[:, :, None]          # [B, S, R]
        ret_mask = (pre_out_rows > 0)[:, :, :, None] & \
            r_ok[:, :, None, :] & \
            (pre_out_dst[:, :, :, None] != ol[:, :, None, :])
        # append slot = in_cnt(src)-1 at the bond = c0-1+r; EXCLUDED rows
        # (the bond's reverse pair) get a HOLE at that slot, never a shift
        # — add_edge's slot comes from in_cnt, not the row's fill
        ret_slot = jnp.clip(c0_in[:, :, None, None] - 1 +
                            rr[None, None, None, :], 0, NBG - 1)
        # linear-index 1-D scatter (flat OOB sentinel for masked lanes)
        ret_lin = jnp.where(
            ret_mask,
            pre_out_rows[:, :, :, None] * NBG + ret_slot, NE * NBG)
        e_bg = e_bg.reshape(-1).at[ret_lin.reshape(-1)].set(
            jnp.broadcast_to(nl[:, :, None, :], ret_lin.shape).reshape(-1),
            mode='drop').reshape(NE, NBG)
        # no row-0 reset needed: every masked target is the OOB sentinel
        # (NE/NA) under mode='drop', so row 0 is never written

        # ---- in/out list appends + counts ---------------------------------
        slot_in_w = jnp.clip(c0_w + rank_w, 0, NBG - 1)
        slot_in_u = jnp.clip(c0_u + rank_u, 0, NBG - 1)
        c0o_u = take_s(out_cnt[ch_atom_f], a_s)
        c0o_w = take_s(out_cnt[ch_atom_f], b_s)
        slot_out_u = jnp.clip(c0o_u + rank_u, 0, NBG - 1)
        slot_out_w = jnp.clip(c0o_w + rank_w, 0, NBG - 1)
        tu = jnp.where(add, u, NA).reshape(-1)
        tw = jnp.where(add, w, NA).reshape(-1)
        e12 = jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])
        # linear-index 1-D scatters (targets with the NA sentinel land at
        # flat index >= NA*NBG = OOB -> dropped; slots are pre-clipped)
        lin_in = jnp.concatenate([tw, tu]) * NBG + jnp.concatenate(
            [slot_in_w.reshape(-1), slot_in_u.reshape(-1)])
        in_g = in_g.reshape(-1).at[lin_in].set(
            e12, mode='drop').reshape(NA, NBG)
        lin_out = jnp.concatenate([tu, tw]) * NBG + jnp.concatenate(
            [slot_out_u.reshape(-1), slot_out_w.reshape(-1)])
        out_g = out_g.reshape(-1).at[lin_out].set(
            e12, mode='drop').reshape(NA, NBG)
        out_dst = out_dst.reshape(-1).at[lin_out].set(
            jnp.concatenate([w.reshape(-1), u.reshape(-1)]),
            mode='drop').reshape(NA, NBG)
        ch_t = jnp.where(cnt_s > 0, ch_atom_f, NA)
        in_cnt = in_cnt.at[ch_t.reshape(-1)].add(cnt_s.reshape(-1),
                                                 mode='drop')
        out_cnt = out_cnt.at[ch_t.reshape(-1)].add(cnt_s.reshape(-1),
                                                   mode='drop')
        # ---- clist / ccnt --------------------------------------------------
        # reused anchor rows: search the PRE out lists (an anchor bond's
        # endpoints both pre-exist, and intra rows can't duplicate a bond)
        po_u = jnp.take_along_axis(pre_out_rows, a_s[:, :, None], axis=1)
        pd_u = jnp.take_along_axis(pre_out_dst, a_s[:, :, None], axis=1)
        po_w = jnp.take_along_axis(pre_out_rows, b_s[:, :, None], axis=1)
        pd_w = jnp.take_along_axis(pre_out_dst, b_s[:, :, None], axis=1)
        r1 = (po_u * ((pd_u == w[:, :, None]) & (po_u > 0))).max(axis=-1)
        r2 = (po_w * ((pd_w == u[:, :, None]) & (po_w > 0))).max(axis=-1)
        reuse = on & anch
        c1 = jnp.where(add, e1, jnp.where(reuse, r1, 0))
        c2 = jnp.where(add, e2, jnp.where(reuse, r2, 0))
        on_i = on.astype(jnp.int32)
        n_nodes_c = clist.shape[1]
        sl = jnp.clip(ccnt[ar, nn_flat][:, None] +
                      2 * (jnp.cumsum(on_i, axis=1) - on_i), 0, KE - 2)
        # linear-index 1-D scatters; masked lanes get the flat OOB sentinel
        # (never base + KE, which would alias the next node's slot 0)
        cl_base = (ar[:, None] * n_nodes_c + nn_flat[:, None]) * KE
        cl_oob = B * n_nodes_c * KE
        clist = clist.reshape(-1).at[
            jnp.where(on, cl_base + sl, cl_oob)].set(c1, mode='drop')
        clist = clist.at[
            jnp.where(on, cl_base + sl + 1, cl_oob)].set(
            c2, mode='drop').reshape(B, n_nodes_c, KE)
        ccnt = ccnt.at[ar, nn_flat].add(2 * on_i.sum(axis=1))
        edge_cnt = edge_cnt + 2 * add_i.sum(axis=1)
        return (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g,
                out_dst, out_cnt, edge_cnt, clist, ccnt)

    def hdec_propose(self, root_vecs, vocab_mask, u_seq, tabs, beam: int,
                     max_nb: int = 12, A: int = 512, Eg: int = 640,
                     NBG: int = 10, KE: int = 64, cand_cap: int = 24,
                     return_state: bool = False):
        """Device-RESIDENT speculative hier decode: the whole autoregressive
        loop as ONE ``lax.scan`` (the 3-level sibling of
        ``MotifDecoder.dec_propose``).  Every step mirrors
        ``hdec_step_fused`` — atom-level refresh of the frontier cluster,
        3-level frontier readout + topology, speculative message update,
        motif top-k — PLUS what the host used to do between calls: the
        assembly-candidate enumeration (IncGraph.get_assm_cands semantics:
        slot runs, bond_match typing, the used-set and the cand_cap
        truncation), candidate scoring against current atom hiddens
        (``hdec_assm``), chemical feasibility via the per-atom valence
        oracle (see ``_assm_tables``), and IncGraph.add_mol's row
        bookkeeping (``_graft_rows``).

        Unlike the motif turbo there is no pinned re-entry: a sample whose
        replay diverges (or that grafts a motif the device cannot track —
        ``tabs['poison']``) falls back to the exact path whole.  Returns
        (packed [T, B, 2+3·beam+7], root_cls, root_icls, poisoned [B]):
        packed rows are the ``dec_step_fused`` layout + committed beam slot,
        committed icls, candidate kind (0 1-pt, 1 fwd, 2 rev), parent slot,
        and the chosen beam's three S-bit candidate-feasibility masks.
        """
        from .decode import hier_topk
        B = root_vecs.shape[0]
        T = u_seq.shape[0]
        S = tabs['stype'].shape[1]
        n_nodes = T + 2
        rows_per = T + 1
        ar = jnp.arange(B)
        base_t = (1 + ar * rows_per).astype(jnp.int32)    # tree/inter rows
        b_of_e = (ar * Eg).astype(jnp.int32)              # edge flat offsets
        b_of_a = (ar * A).astype(jnp.int32)               # atom flat offsets
        H = self.hidden_size

        init = self.root_vecs_to_hidden(root_vecs)
        n_trows = 1 + B * rows_per
        tree_s = self.tree_rnn.init_state(n_trows)
        tree_s = (tree_s[0].at[base_t].set(init.astype(tree_s[0].dtype)),) \
            + tuple(tree_s[1:])
        inter_s = self.inter_rnn.init_state(n_trows)
        graph_s = self.graph_rnn.init_state(1 + B * Eg)
        hatom = jnp.zeros((1 + B * A, H))
        hinter = jnp.zeros((1 + B * n_nodes, H))

        # root motif (decode_hier root heads: argmax cls, masked argmax icls)
        cls_l = self.clsNN(jnp.concatenate([init, root_vecs], -1), True)
        icls_l = self.iclsNN(jnp.concatenate([init, root_vecs], -1), True)
        root_cls = jnp.argmax(cls_l, axis=-1).astype(jnp.int32)
        root_icls = jnp.argmax(icls_l + vocab_mask[root_cls],
                               axis=-1).astype(jnp.int32)

        # ---- motif-oracle node state (same as MotifDecoder.dec_propose) --
        clab = jnp.zeros((B, n_nodes), jnp.int32).at[:, 0].set(root_cls)
        ilab = jnp.zeros((B, n_nodes), jnp.int32).at[:, 0].set(root_icls)
        slot_used = jnp.zeros((B, n_nodes, S),
                              bool).at[:, 0].set(tabs['bused'][root_icls])
        atom_fv = jnp.zeros((B, A),
                            jnp.int32).at[:, :S].set(tabs['bfv'][root_icls])
        slot_atom = jnp.zeros((B, n_nodes, S), jnp.int32) \
            .at[:, 0, :].set(jnp.arange(S)[None, :])
        atom_cnt = tabs['n_at'][root_icls].astype(jnp.int32)
        node_as2 = jnp.zeros((B, n_nodes), bool)
        in_deg = jnp.zeros((B, n_nodes), jnp.int32).at[:, 0].set(1)
        agraph = jnp.zeros((B, n_nodes, max_nb),
                           jnp.int32).at[:, 0, 0].set(base_t)
        down_row = jnp.zeros((B, n_nodes), jnp.int32).at[:, 0].set(base_t)
        stack = jnp.zeros((B, n_nodes), jnp.int32)
        sp = jnp.ones((B,), jnp.int32)
        nxt = jnp.ones((B,), jnp.int32)
        poisoned = tabs['poison'][root_icls] | tabs['noop'][root_icls]

        # ---- atom/edge row bookkeeping -----------------------------------
        a_av = jnp.zeros(1 + B * A, jnp.int32)
        e_av = jnp.zeros(1 + B * Eg, jnp.int32)
        e_bt = jnp.zeros(1 + B * Eg, jnp.int32)
        e_nth = jnp.zeros(1 + B * Eg, jnp.int32)
        e_bg = jnp.zeros((1 + B * Eg, NBG), jnp.int32)
        in_g = jnp.zeros((1 + B * A, NBG), jnp.int32)
        in_cnt = jnp.zeros(1 + B * A, jnp.int32)
        out_g = jnp.zeros((1 + B * A, NBG), jnp.int32)
        out_dst = jnp.zeros((1 + B * A, NBG), jnp.int32)
        out_cnt = jnp.zeros(1 + B * A, jnp.int32)
        edge_cnt = jnp.zeros(B, jnp.int32)
        clist = jnp.zeros((B, n_nodes, KE), jnp.int32)
        ccnt = jnp.zeros((B, n_nodes), jnp.int32)

        sidxS = jnp.arange(S)[None, :]
        # root graft: add_mol(b, root_ismiles, [], 0) — no attach aliasing,
        # atoms 0..n_at-1, all bonds new.  Budget guard mirrors the in-step
        # one: a root whose rows would not fit poisons the sample up front
        # (writes from a poisoned root are suppressed via do_c=False).
        root_n = tabs['n_at'][root_icls]
        root_fits = (2 * tabs['nbond'][root_icls] <= Eg) & (root_n <= A)
        poisoned = poisoned | ~root_fits
        root_valid = (sidxS < root_n[:, None]) & root_fits[:, None]
        root_atom_f = jnp.where(root_valid,
                                1 + b_of_a[:, None] + sidxS, 0)
        a_av = a_av.at[jnp.where(root_valid, root_atom_f, 0)].set(
            jnp.where(root_valid, tabs['av'][root_icls], 0)).at[0].set(0)
        carry_g = (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g,
                   out_dst, out_cnt, edge_cnt, clist, ccnt)
        carry_g = self._graft_rows_vec(
            tabs, carry_g, b_of_e, root_icls, root_atom_f,
            root_fits, jnp.zeros(B, jnp.int32),
            jnp.zeros(B, bool), jnp.zeros(B, jnp.int32), Eg, NBG, KE)
        (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
         out_cnt, edge_cnt, clist, ccnt) = carry_g

        eyeA = None  # (one-hot built inline)

        def step(carry, inputs):
            (tree_s, inter_s, graph_s, hatom, hinter,
             clab, ilab, slot_used, atom_fv, slot_atom, atom_cnt, node_as2,
             in_deg, agraph, down_row, stack, sp, nxt, poisoned,
             a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
             out_cnt, edge_cnt, clist, ccnt) = carry
            t, u = inputs
            active = sp > 0
            v = stack[ar, jnp.maximum(sp - 1, 0)]
            v_clab = clab[ar, v]
            v_il = ilab[ar, v]
            v_ag = agraph[ar, v]

            # ---- (1) atom-level refresh of the frontier cluster ----------
            c_rows = clist[ar, v]                              # [B, KE] flat
            cr_flat = c_rows.reshape(-1)
            x_g = jnp.concatenate([
                jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[e_av[cr_flat]],
                jnp.eye(4, dtype=jnp.float32)[jnp.clip(e_bt[cr_flat], 0, 3)],
                pos_onehot(e_nth[cr_flat])], axis=-1)
            graph_s = self._sparse_local(self.graph_rnn, graph_s, cr_flat,
                                         x_g, e_bg[cr_flat], self.diterG)
            gh = self.graph_rnn.hidden(graph_s)
            # ONE packed gather for every parent column (the scan body is
            # op-launch-bound; see decode._assm_tables' pack layout)
            pp = tabs['ppack'][v_il]                           # [B, 3+7S]
            p_n = pp[:, 0]
            c_valid = sidxS < p_n[:, None]
            catoms_l = slot_atom[ar, v]                        # [B, S] local
            catoms = jnp.where(c_valid & active[:, None],
                               1 + b_of_a[:, None] + catoms_l, 0)
            cf = catoms.reshape(-1)
            node_h = nn.relu(self.W_graph_node(jnp.concatenate(
                [jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[a_av[cf]],
                 gh[in_g[cf]].sum(axis=-2)], axis=-1)))
            hatom = hatom.at[cf].set(
                jnp.where((cf > 0)[:, None], node_h, 0.0))

            # ---- (2) 3-level frontier readout + topology ------------------
            hclu_v = hatom[catoms].sum(axis=1)                 # [B, H]
            inter_emb = nn.relu(self.W_i(jnp.concatenate(
                [self._ei()(v_il), hclu_v], axis=-1)))
            ih = self.inter_rnn.hidden(inter_s)
            inter_node = nn.relu(self.W_inter_node(jnp.concatenate(
                [inter_emb, ih[v_ag].sum(axis=-2)], axis=-1)))
            v_flat = 1 + ar * n_nodes + v
            # inactive lanes redirect to padding row 0 (their v_flat is a
            # live row that must keep its value) — one masked scatter
            hinter = hinter.at[jnp.where(active, v_flat, 0)].set(
                jnp.where(active[:, None], inter_node, 0.0))
            tree_emb = nn.relu(self.W_c(jnp.concatenate(
                [self._ec()(v_clab), inter_node], axis=-1)))
            th0 = self.tree_rnn.hidden(tree_s)
            tree_node = nn.relu(self.W_tree_node(jnp.concatenate(
                [tree_emb, th0[v_ag].sum(axis=-2)], axis=-1)))
            topo_logits = self.topoNN(
                jnp.concatenate([tree_node, root_vecs], -1), True)[..., 0]

            can_exp = in_deg[ar, v] < max_nb
            choose = (jax.nn.sigmoid(topo_logits) > u) & can_exp & active
            top = stack[ar, jnp.maximum(sp - 2, 0)]
            bt_valid = active & (~choose) & (sp >= 2)
            bt_pos = jnp.minimum(in_deg[ar, top], MAX_POS - 1)
            bt_bg = jnp.where(v_ag == down_row[ar, v][:, None], 0, v_ag)

            # ---- (3) speculative message update + motif top-k -------------
            row_t = base_t + 1 + t
            rows = jnp.where(choose | bt_valid, row_t, 0)
            pos = jnp.where(choose, 0, bt_pos)
            bg = jnp.where(choose[:, None], v_ag, bt_bg)
            x_i = jnp.concatenate([inter_emb, pos_onehot(pos)], axis=-1)
            inter_s = self._sparse_direct(self.inter_rnn, inter_s, rows,
                                          x_i, bg, self.diterT)
            x_t = jnp.concatenate([
                nn.relu(self.W_c(jnp.concatenate(
                    [self._ec()(v_clab), hinter[v_flat]], axis=-1))),
                pos_onehot(pos)], axis=-1)
            tree_s = self._sparse_direct(self.tree_rnn, tree_s, rows,
                                         x_t, bg, self.diterT)
            th = self.tree_rnn.hidden(tree_s)
            x_cls = jnp.concatenate([th[rows], root_vecs], axis=-1)
            cls_s = self.clsNN(x_cls, True)
            icls_s = self.iclsNN(x_cls, True)
            scores, cls_k, icls_k = hier_topk(cls_s, icls_s, vocab_mask, beam)

            # ---- (4) candidate enumeration + oracle + scoring -------------
            p_typ = pp[:, 3:3 + S]                             # [B, S]
            p_ap = pp[:, 1:3]                                  # [B, 2]
            # ring neighbours + their types + motif bond orders are static
            # per icls and come packed (see decode._assm_tables)
            t_nxt = pp[:, 3 + S:3 + 2 * S]
            t_prv = pp[:, 3 + 2 * S:3 + 3 * S]
            ab_nxt = pp[:, 3 + 3 * S:3 + 4 * S]
            ab_prv = pp[:, 3 + 4 * S:3 + 5 * S]
            nxt_s = pp[:, 3 + 5 * S:3 + 6 * S]
            prv_s = pp[:, 3 + 6 * S:3 + 7 * S]
            p_used = slot_used[ar, v]
            p_slot_atom = slot_atom[ar, v]
            p_fv = jnp.take_along_axis(atom_fv, p_slot_atom, axis=1)
            p_as2 = node_as2[ar, v]
            p_single = p_n <= 1

            s_valid = sidxS < p_n[:, None]
            # free valence of each slot's fwd+rev ring neighbour (dynamic —
            # ONE fused take_along_axis instead of two)
            fv2 = jnp.take_along_axis(
                p_fv, jnp.concatenate([nxt_s, prv_s], axis=1), axis=1)
            fv_nxt, fv_prv = fv2[:, :S], fv2[:, S:]
            ap0, ap1 = p_ap[:, 0:1], p_ap[:, 1:2]
            excl_f = p_as2[:, None] & (
                ((sidxS == ap0) & (nxt_s == ap1)) |
                ((sidxS == ap1) & (nxt_s == ap0)))
            excl_r = p_as2[:, None] & (
                ((sidxS == ap0) & (prv_s == ap1)) |
                ((sidxS == ap1) & (prv_s == ap0)))

            c_il = icls_k                                      # [B, K]
            cp = tabs['cpack'][c_il]                           # [B, K, 10]
            c_isz = cp[..., 0]
            c_fail = cp[..., 1].astype(bool)
            c_sym = cp[..., 3].astype(bool)
            c_t0 = cp[..., 4]
            c_t1 = cp[..., 5]
            c_n0 = cp[..., 6]
            c_n1 = cp[..., 7]
            c_apb = cp[..., 8]
            c_track = (~cp[..., 9].astype(bool)) & \
                (~cp[..., 2].astype(bool)) & (~c_fail)

            # membership in get_assm_cands' list (pre-valence), per kind
            elig1 = s_valid[:, None, :] & (~p_used[:, None, :]) & \
                (c_isz[..., None] == 1)                        # [B, K, S]
            tm_f = (p_typ[:, None, :] == c_t0[..., None]) & \
                (t_nxt[:, None, :] == c_t1[..., None])
            tm_r = (p_typ[:, None, :] == c_t0[..., None]) & \
                (t_prv[:, None, :] == c_t1[..., None])
            pairable = s_valid[:, None, :] & (p_n[:, None, None] >= 2) & \
                (c_isz[..., None] == 2)
            elig_f = pairable & (~excl_f[:, None, :]) & tm_f
            elig_r = pairable & (~excl_r[:, None, :]) & tm_r & \
                (~c_sym[..., None])
            # enumeration rank (cand_cap truncation, decode.pack_cands)
            rank1 = jnp.cumsum(elig1, axis=-1) - 1
            rank_f = jnp.cumsum(elig_f, axis=-1) - 1
            nf = elig_f.sum(axis=-1, keepdims=True)
            # reverse enumeration: largest slot first
            rank_r = nf + jnp.cumsum(elig_r[..., ::-1], axis=-1)[..., ::-1] - 1
            n_cands = elig1.sum(-1) + elig_f.sum(-1) + elig_r.sum(-1)

            # oracle feasibility (valence; mirrors try_add_mol)
            f1 = elig1 & (p_typ[:, None, :] == c_t0[..., None]) & \
                (p_fv[:, None, :] >= c_n0[..., None])
            ex_f = (ab_nxt[:, None, :] == 0) * c_apb[..., None]
            ff = elig_f & (p_fv[:, None, :] >= c_n0[..., None] + ex_f) & \
                (fv_nxt[:, None, :] >= c_n1[..., None] + ex_f)
            ex_r = (ab_prv[:, None, :] == 0) * c_apb[..., None]
            fr = elig_r & (p_fv[:, None, :] >= c_n0[..., None] + ex_r) & \
                (fv_prv[:, None, :] >= c_n1[..., None] + ex_r)

            # assembly scores against current atom hiddens (hdec_assm)
            nth_sc = jnp.minimum(in_deg[ar, v], MAX_POS - 1)
            aflat = lambda loc: jnp.where(
                s_valid, 1 + b_of_a[:, None] +
                jnp.take_along_axis(p_slot_atom, loc, 1), 0)
            a_self = jnp.where(s_valid,
                               1 + b_of_a[:, None] + p_slot_atom, 0)
            a_nxt = aflat(nxt_s)
            a_prv = aflat(prv_s)
            h_self = hatom[a_self]                             # [B, S, H]
            h_nxt = hatom[a_nxt]
            h_prv = hatom[a_prv]
            ap_c = tabs['apack'][c_il]                         # [B, K, 3]
            ic_e = self._ei()(ap_c[..., :2])                   # [B, K, 2, E]
            nmask = (jnp.arange(2)[None, None, :] <
                     ap_c[..., 2:3])                           # [B, K, 2]
            pos_e = pos_onehot(nth_sc)                         # [B, P]

            def pair_score(h0, h1):
                # [B, S, H] endpoints → [B, K, S] scores
                hh = jnp.stack([h0, h1], axis=2)               # [B, S, 2, H]
                hh = hh[:, None]                               # [B,1,S,2,H]
                ie = ic_e[:, :, None]                          # [B,K,1,2,E]
                K = ic_e.shape[1]
                pe = jnp.broadcast_to(
                    pos_e[:, None, None, None, :],
                    (B, K, S, 2, pos_e.shape[-1]))
                hhb = jnp.broadcast_to(hh, (B, K, S, 2, H))
                ieb = jnp.broadcast_to(ie, (B, K, S, 2, ic_e.shape[-1]))
                mvec = nn.relu(self.matchNN(
                    jnp.concatenate([hhb, ieb, pe], axis=-1)))
                mvec = mvec * nmask[:, :, None, :, None]
                cand = mvec.sum(axis=3)                        # [B, K, S, H]
                return (self.W_assm(cand) *
                        root_vecs[:, None, None, :]).sum(-1)

            sc1 = pair_score(h_self, h_self)
            scf = pair_score(h_self, h_nxt)
            scr = pair_score(h_self, h_prv)

            neg = jnp.finfo(jnp.float32).min / 4
            capped = lambda f, r: f & (r < cand_cap)
            m1 = capped(f1, rank1)
            mf = capped(ff, rank_f)
            mr = capped(fr, rank_r)
            all_sc = jnp.concatenate([
                jnp.where(m1, sc1, neg), jnp.where(mf, scf, neg),
                jnp.where(mr, scr, neg)], axis=-1)             # [B, K, 3S]
            all_rank = jnp.concatenate([rank1, rank_f, rank_r], axis=-1)
            feas_any = (m1 | mf | mr).any(-1)                  # [B, K]
            best = all_sc.max(-1)
            is_best = all_sc >= best[..., None]
            # stable tie-break: smallest enumeration rank among max scores
            pick = jnp.argmin(jnp.where(is_best, all_rank, 10 ** 6),
                              axis=-1)                         # [B, K]
            pick_kind = pick // S                              # 0/1/2
            pick_slot = pick % S

            any_feas = feas_any.any(axis=1)
            j_star = jnp.argmax(feas_any, axis=1).astype(jnp.int32)
            take = lambda x: jnp.take_along_axis(
                x, j_star[:, None], axis=1)[:, 0]
            new_clab = jnp.where(any_feas, take(cls_k),
                                 cls_k[:, 0]).astype(jnp.int32)
            new_ilab = jnp.where(any_feas, take(icls_k),
                                 icls_k[:, 0]).astype(jnp.int32)
            kindA = take(pick_kind).astype(jnp.int32)
            slotA = take(pick_slot).astype(jnp.int32)
            slotB = jnp.where(
                kindA == 2,
                jnp.take_along_axis(prv_s, slotA[:, None], 1)[:, 0],
                jnp.take_along_axis(nxt_s, slotA[:, None], 1)[:, 0])
            exA_all = jnp.where(kindA[:, None, None] == 2, ex_r, ex_f)
            exA_j = jnp.take_along_axis(
                exA_all, j_star[:, None, None], axis=1)[:, 0]  # [B, S]
            exA = jnp.take_along_axis(exA_j, slotA[:, None], 1)[:, 0]
            nc_j = take(n_cands)
            ct_j = take(c_track)
            isz_j = take(c_isz)
            is2 = isz_j == 2
            c_n0j = take(c_n0)
            c_n1j = take(c_n1)
            extraA = c_n0j + jnp.where(is2, exA, 0)
            extraB = c_n1j + jnp.where(is2, exA, 0)

            # ---- (5) commit bookkeeping (motif dec_propose block) ---------
            forced = active & choose & (~any_feas)
            commit = choose & any_feas
            nn_i = jnp.minimum(nxt, n_nodes - 1)
            clab = clab.at[ar, nn_i].set(
                jnp.where(choose, new_clab, clab[ar, nn_i]))
            ilab = ilab.at[ar, nn_i].set(
                jnp.where(choose, new_ilab, ilab[ar, nn_i]))
            down_row = down_row.at[ar, nn_i].set(
                jnp.where(choose, row_t, down_row[ar, nn_i]))
            agraph = agraph.at[ar, nn_i, 0].set(
                jnp.where(choose, row_t, agraph[ar, nn_i, 0]))
            in_deg = in_deg.at[ar, nn_i].set(
                jnp.where(choose, 1, in_deg[ar, nn_i]))
            sp_slot = jnp.minimum(sp, n_nodes - 1)
            stack = stack.at[ar, sp_slot].set(
                jnp.where(choose, nn_i, stack[ar, sp_slot]))
            slot = jnp.minimum(in_deg[ar, top], max_nb - 1)
            agraph = agraph.at[ar, top, slot].set(
                jnp.where(bt_valid, row_t, agraph[ar, top, slot]))
            close_top = bt_valid | (forced & (sp >= 2))
            in_deg = in_deg.at[ar, top].set(
                in_deg[ar, top] + close_top.astype(jnp.int32))
            in_deg = in_deg.at[ar, v].set(
                in_deg[ar, v] + forced.astype(jnp.int32))
            push = choose & (~forced)
            pop = active & (~choose)
            sp = sp + push.astype(jnp.int32) - pop.astype(jnp.int32) \
                - forced.astype(jnp.int32)
            nxt = nxt + choose.astype(jnp.int32)

            # resource-budget guard: a graft that would outrun the sample's
            # static edge-row budget writes into the NEXT sample's flat
            # region (cross-sample corruption), and one that outruns the
            # atom budget clamps onto the shared A-1 slot (silent drift).
            # Poison such samples instead — they fall back to the exact
            # host path, preserving turbo's equivalence guarantee.
            # ONE packed gather for every child-birth column (see
            # decode._assm_tables' bpack layout)
            bp = tabs['bpack'][new_ilab]                       # [B, 8+5S]
            isz2c = bp[:, 1] >= 2
            n_new_c = jnp.maximum(
                bp[:, 0] - 1 - isz2c.astype(jnp.int32), 0)
            need_e = 2 * bp[:, 7]
            ovf = (edge_cnt + need_e > Eg) | (atom_cnt + n_new_c > A) | \
                  (ccnt[ar, nn_i] + need_e > KE)
            do_c = commit & ct_j & (~poisoned) & (~ovf)
            poisoned = poisoned | (commit & ((~ct_j) | ovf))
            do_pair = do_c & is2

            curA_used = jnp.take_along_axis(p_used, slotA[:, None], 1)[:, 0]
            curB_used = jnp.take_along_axis(p_used, slotB[:, None], 1)[:, 0]
            slot_used = slot_used.at[ar, v, slotA].set(
                jnp.where(do_c & (~p_single), True, curA_used))
            slot_used = slot_used.at[ar, v, slotB].set(
                jnp.where(do_pair & (~p_single), True, curB_used))
            paA = jnp.take_along_axis(p_slot_atom, slotA[:, None], 1)[:, 0]
            paB = jnp.take_along_axis(p_slot_atom, slotB[:, None], 1)[:, 0]
            atom_fv = atom_fv.at[ar, paA].add(jnp.where(do_c, -extraA, 0))
            atom_fv = atom_fv.at[ar, paB].add(jnp.where(do_pair, -extraB, 0))

            ch_used = jnp.where(choose[:, None],
                                bp[:, 8:8 + S].astype(bool),
                                slot_used[ar, nn_i])
            slot_used = slot_used.at[ar, nn_i].set(ch_used)
            ch_ap = bp[:, 5:7]
            ch_bfv = bp[:, 8 + S:8 + 2 * S]
            ch_new_atom = jnp.minimum(
                atom_cnt[:, None] + bp[:, 8 + 2 * S:8 + 3 * S], A - 1)
            ch_atom = jnp.where(
                sidxS == ch_ap[:, 0:1], paA[:, None],
                jnp.where(isz2c[:, None] & (sidxS == ch_ap[:, 1:2]),
                          paB[:, None], ch_new_atom))
            slot_atom = slot_atom.at[ar, nn_i].set(
                jnp.where(choose[:, None], ch_atom, slot_atom[ar, nn_i]))
            ch_valid = sidxS < bp[:, 0:1]
            wmask = do_c[:, None] & ch_valid & \
                (~bp[:, 8 + 3 * S:8 + 4 * S].astype(bool))
            wtgt = jnp.where(wmask, ch_atom, A - 1)
            atom_fv = atom_fv.at[ar[:, None], wtgt].set(ch_bfv)
            atom_cnt = atom_cnt + jnp.where(do_c, n_new_c, 0)
            # grafted onto an EXISTING parent bond ⇔ no extra anchor-bond
            # valence was needed (ex == 0; inc_graph.py:195-196).
            # NOTE twin in decoder.dec_propose: there the predicate reads
            # `exA == needs[0]` because its exA is extraA = needs[0] + raw;
            # this file's exA is the raw extra — same predicate
            as2_child = do_pair & (bp[:, 3] > 0) & (exA == 0)
            node_as2 = node_as2.at[ar, nn_i].set(
                jnp.where(choose, as2_child, node_as2[ar, nn_i]))

            # ---- (6) graft atom-level rows --------------------------------
            # new-atom vocab ids (add_mol's enumerate; attach slots keep
            # the parent atom's existing a_av)
            ch_atom_f = jnp.where(ch_valid & do_c[:, None],
                                  1 + b_of_a[:, None] + ch_atom, 0)
            av_tgt = jnp.where(wmask, ch_atom_f, 0)
            # masked lanes target row 0 and write 0 — one scatter, no
            # gather or row0 fixup
            a_av = a_av.at[av_tgt].set(
                jnp.where(wmask, bp[:, 8 + 4 * S:8 + 5 * S], 0))
            # adj[slotA, slotB]: slotB is slotA's ring prv (kind 2) or nxt,
            # whose motif bond order is exactly ab_prv/ab_nxt at slotA
            pbond = jnp.take_along_axis(
                jnp.where((kindA == 2)[:, None], ab_prv, ab_nxt),
                slotA[:, None], 1)[:, 0]
            skip_anchor = do_pair & (pbond > 0)
            nth_edge = jnp.where(nc_j == 1, 0, in_deg[ar, v])
            carry_g = (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g,
                       out_dst, out_cnt, edge_cnt, clist, ccnt)
            carry_g = self._graft_rows_vec(tabs, carry_g, b_of_e, new_ilab,
                                           ch_atom_f, do_c, nth_edge,
                                           skip_anchor, nn_i, Eg, NBG, KE)
            (a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt, out_g, out_dst,
             out_cnt, edge_cnt, clist, ccnt) = carry_g

            j_pack = jnp.where(choose,
                               jnp.where(any_feas, j_star, -1), 0)
            # chosen beam's candidate feasibility masks (1-pt / fwd / rev),
            # one S-bit bitmask each (S = 24 ≤ f32 mantissa, exact) — the
            # host replay verifies every bit against real chemistry, so an
            # oracle false-negative that would change the within-beam
            # argmax triggers fallback instead of silent divergence
            bitw = (2.0 ** jnp.arange(S, dtype=jnp.float32))[None, None, :]
            fm1 = take((m1 * bitw).sum(-1))
            fmf = take((mf * bitw).sum(-1))
            fmr = take((mr * bitw).sum(-1))
            packed = jnp.concatenate(
                [topo_logits[:, None], choose.astype(jnp.float32)[:, None],
                 scores, cls_k.astype(jnp.float32),
                 icls_k.astype(jnp.float32),
                 j_pack.astype(jnp.float32)[:, None],
                 new_ilab.astype(jnp.float32)[:, None],
                 kindA.astype(jnp.float32)[:, None],
                 slotA.astype(jnp.float32)[:, None],
                 fm1[:, None], fmf[:, None], fmr[:, None]], axis=1)
            return (tree_s, inter_s, graph_s, hatom, hinter,
                    clab, ilab, slot_used, atom_fv, slot_atom, atom_cnt,
                    node_as2, in_deg, agraph, down_row, stack, sp, nxt,
                    poisoned, a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt,
                    out_g, out_dst, out_cnt, edge_cnt, clist, ccnt), packed

        carry0 = (tree_s, inter_s, graph_s, hatom, hinter,
                  clab, ilab, slot_used, atom_fv, slot_atom, atom_cnt,
                  node_as2, in_deg, agraph, down_row, stack, sp, nxt,
                  poisoned, a_av, e_av, e_bt, e_nth, e_bg, in_g, in_cnt,
                  out_g, out_dst, out_cnt, edge_cnt, clist, ccnt)
        # EARLY-TERMINATING loop (not lax.scan): see MotifDecoder.dec_propose
        # — the hier step body is ~10x the motif's (3-level refresh + graft
        # loop, runs/PROPOSE_COST.json: 46 MB/step vs 2.4), so stopping at
        # the batch's true max decode length instead of the full T budget is
        # the single biggest lever on hier decode wall-clock.  Rows past the
        # stop step stay zero (choose=0) = "finished" to every consumer.
        packed0 = jnp.zeros((T, B, 9 + 3 * beam), jnp.float32)

        def loop_cond(st):
            t, carry, _ = st
            return (t < T) & jnp.any(carry[16] > 0)

        def loop_body(st):
            t, carry, packed = st
            carry, row = step(carry, (t, u_seq[t]))
            packed = jax.lax.dynamic_update_slice(packed, row[None],
                                                  (t, 0, 0))
            return t + 1, carry, packed

        _, carry1, packed = jax.lax.while_loop(
            loop_cond, loop_body,
            (jnp.asarray(0, jnp.int32), carry0, packed0))
        if return_state:
            return packed, root_cls, root_icls, carry1
        return packed, root_cls, root_icls, carry1[18]
