"""Batched autoregressive decoding (reconstruction / sampling).

Host-orchestrated redesign of the reference decode loop
(/root/reference/ggpm/decoder.py:901-1095).  The reference interleaves
per-sample Python, RDKit calls, and many small device↔host copies inside the
loop; here each step runs exactly two fixed-shape jitted device calls
(frontier readout → topology; fused message-update + motif top-k) on
[B]-sized tensors, while motif assembly / validity checking stays on host
against the chem kernel.

The assembly scorer is candidate-independent for the motif decoder (see
``ggpm_tpu.models.decoder`` docstring), so candidate ranking reduces to the
reference's stable-sort enumeration order — no device round-trip needed.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.vocab import PairVocab, Vocab
from .inc_graph import IncGraph, IncTree


def _topk_small(x: jnp.ndarray, k: int):
    """Top-k by k unrolled argmax passes — same values/indices as
    ``lax.top_k`` (ties break to the lowest index in both).  ``lax.top_k``
    lowers to a full sort on TPU, which dominates the decode scan's step
    cost for the beam-sized k used here (measured: 2.2× faster at k=5,
    bit-identical results)."""
    ar = jnp.arange(x.shape[-1])
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0])
        idxs.append(i)
        x = jnp.where(ar == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def hier_topk(cls_scores: jnp.ndarray, icls_scores: jnp.ndarray,
              mask: jnp.ndarray, beam: int):
    """Joint coarse×fine top-k (reference nnutils.py:131-153), fully on
    device."""
    cls_lsm = jax.nn.log_softmax(cls_scores, axis=-1)
    top_scores, top_cls = _topk_small(cls_lsm, beam)            # [B, K]
    m = mask[top_cls]                                           # [B, K, iv]
    icls_lsm = jax.nn.log_softmax(icls_scores[:, None, :] + m, axis=-1)
    iscores, itop = _topk_small(icls_lsm, beam)                 # [B, K, K]
    total = top_scores[..., None] + iscores                     # [B, K, K]
    b = cls_scores.shape[0]
    flat = total.reshape(b, beam * beam)
    fscores, fidx = _topk_small(flat, beam)                     # [B, K]
    cls_k = jnp.take_along_axis(top_cls, fidx // beam, axis=-1)
    icls_k = jnp.take_along_axis(itop.reshape(b, beam * beam), fidx, axis=-1)
    return fscores, cls_k, icls_k



def _pick_beam(greedy, beam, scores_row, rng):
    """Candidate visiting order: greedy rank order or score-weighted shuffle
    (reference decoder.py:1033)."""
    if greedy:
        return range(beam)
    prob = np.exp(scores_row - scores_row.max())
    prob = prob / prob.sum()
    return rng.choice(beam, size=beam, replace=False, p=prob)


def _forced_backtrack(tree, stack, b):
    """Pop the failed node and close the backtrack edges (reference
    decoder.py:1079-1089)."""
    child = stack[b].pop()
    top = stack[b][-1]
    tree.add_edge(child, top, (child, top, tree.in_degree(top)))
    child = stack[b].pop()
    if stack[b]:
        top = stack[b][-1]
        tree.add_edge(child, top, (child, top, tree.in_degree(top)))


def _try_assemble(tree, graph, vocab, b, new_node, fa_node, cls_beam,
                  cls_topk_row, icls_topk_row, score_cands, log_entry):
    """Beam-retry motif assembly with chemical-validity rollback (reference
    decoder.py:1037-1077).  ``score_cands`` orders multi-candidate sets
    (None → stable enumeration order, the motif decoder's degenerate case);
    returns the committed ``(clab, ilab)`` on success (truthy), None on
    total failure."""
    try:
        for kk in cls_beam:
            clab, ilab = int(cls_topk_row[kk]), int(icls_topk_row[kk])
            tree.set_node_feature(new_node, (clab, ilab))
            smiles = vocab.get_smiles(clab)
            ismiles = vocab.get_ismiles(ilab)
            fa_cluster, _, fa_used = tree.get_cluster(fa_node)
            inter_cands, anchor_smiles, attach_points = \
                graph.get_assm_cands(fa_cluster, fa_used, ismiles)
            if len(inter_cands) == 0:
                continue
            if len(inter_cands) == 1:
                sorted_cands = [list(inter_cands[0])]
                nth_child = 0
            else:
                nth_child = tree.in_degree(fa_node)
                if score_cands is None:
                    sorted_cands = [list(c) for c in inter_cands]
                else:
                    sorted_cands = score_cands(b, smiles, inter_cands,
                                               anchor_smiles, nth_child,
                                               ilab)
            for inter_label in sorted_cands:
                pairs = list(zip(inter_label, attach_points))
                if graph.try_add_mol(b, ismiles, pairs):
                    new_atoms, new_bonds, attached = graph.add_mol(
                        b, ismiles, pairs, nth_child)
                    tree.register_cgraph(new_node, new_atoms, new_bonds,
                                         attached)
                    tree.update_attached(fa_node, pairs)
                    if log_entry is not None:
                        log_entry['Attaching Fragment'] = (
                            ismiles, attach_points, pairs)
                    return (clab, ilab)
    except Exception:
        pass
    return None


_KERNEL_CACHE: "OrderedDict" = None
_KERNEL_CACHE_SIZE = 4


def _get_kernel(cls, model, params, vocab_mask, beam, *extra):
    """Reuse kernel objects across decode calls (bounded LRU).

    ``jax.jit`` caches compilations per function object; each kernel holds
    fresh jit closures, so constructing a kernel per decode call would
    recompile every step function on every call (~minutes at quality-run
    batch sizes).  Keyed by object identity: params pytrees are immutable
    and long-lived in every driver (trainer state / loaded checkpoint).

    The cache is a small LRU: each entry pins its params tree (host+device
    buffers) and jit caches, so an unbounded cache leaks a full model per
    decode call in drivers that decode with evolving params (e.g. decode
    after every fine-tune epoch)."""
    global _KERNEL_CACHE
    if _KERNEL_CACHE is None:
        from collections import OrderedDict
        _KERNEL_CACHE = OrderedDict()
    key = (cls, id(model), id(params), id(vocab_mask), beam) + extra
    kern = _KERNEL_CACHE.get(key)
    if kern is None:
        kern = cls(model, params, vocab_mask, beam, *extra)
        # keep the keyed objects alive so id() keys can't be recycled
        kern._cache_refs = (model, params, vocab_mask)
        _KERNEL_CACHE[key] = kern
        while len(_KERNEL_CACHE) > _KERNEL_CACHE_SIZE:
            _KERNEL_CACHE.popitem(last=False)
    else:
        _KERNEL_CACHE.move_to_end(key)
    return kern


def _check_no_attention(model, has_src: bool = False):
    """use_attention models condition their heads on encoder node memory at
    TRAINING time; decoding one WITHOUT that memory would silently degrade
    generations (heads see contexts they were never trained on — ADVICE
    r2).  The exact motif path threads ``src_mem``/``src_scope`` (pass the
    output of the model's ``encode_attention_memory``); callers that don't
    — prior sampling, the turbo paths — refuse loudly instead."""
    cfg = getattr(model, 'cfg', None)
    if cfg is not None and getattr(cfg, 'use_attention', False) \
            and not has_src:
        raise NotImplementedError(
            'this decode path does not thread encoder attention memory: a '
            'model built with use_attention=True would be decoded with '
            'contexts its heads were never trained on (see ADVICE r2). '
            'For reconstruction, pass src_mem/src_scope from '
            'encode_attention_memory to decode_motif; prior sampling has '
            'no source molecule, so train without use_attention for it.')


class MotifDecodeKernel:
    """Jit-compiled per-step device functions bound to (model, params)."""

    def __init__(self, model, params, vocab_mask: np.ndarray, beam: int = 5):
        self.model = model
        self.params = params
        self.mask = jnp.asarray(vocab_mask)
        self.beam = beam

        # Params and the vocab mask must be runtime ARGUMENTS of the jitted
        # functions, never closure-captured: captured arrays become
        # trace-time constants, so (a) every param leaf is fetched from the
        # device and embedded as an MLIR literal at lowering time (minutes
        # over the TPU relay), and (b) tracing advanced indexing on a
        # constant mask (``mask[top_cls]`` in hier_topk) takes minutes —
        # measured 320s vs 0.1s with the mask passed as an argument.
        def dec(name, static_argnums=()):
            def f(params, *args):
                return model.apply(
                    params, *args,
                    method=lambda m, *a: getattr(m._decoder(), name)(*a))
            jf = jax.jit(f, static_argnums=tuple(1 + i for i in static_argnums))
            return lambda *a: jf(self.params, *a)

        self.init_state = dec('dec_init_state', static_argnums=(0,))
        self.update = dec('dec_update')
        self.topo = dec('dec_topo')
        self.cls = dec('dec_cls')
        self.root_cls = dec('dec_root_cls')

        def fused(params, state, rows, src_clab, pos, bgraph_rows, root_vecs,
                  mask):
            return model.apply(
                params, state, rows, src_clab, pos, bgraph_rows, root_vecs,
                mask, beam,
                method=lambda m, *a: m._decoder().dec_update_cls_topk(*a))
        _update_cls_topk = jax.jit(fused)
        self.update_cls_topk = \
            lambda *a: _update_cls_topk(self.params, *a, self.mask)

        def step(params, state, v_clab, agraph_rows, can_expand, u, new_rows,
                 exp_src_clab, exp_bg_rows, bt_valid, bt_src_clab, bt_pos,
                 bt_bg_rows, root_vecs, mask, src_mem, src_mask):
            return model.apply(
                params, state, v_clab, agraph_rows, can_expand, u, new_rows,
                exp_src_clab, exp_bg_rows, bt_valid, bt_src_clab, bt_pos,
                bt_bg_rows, root_vecs, mask, beam, src_mem, src_mask,
                method=lambda m, *a: m._decoder().dec_step_fused(*a))
        _step_fused = jax.jit(step)
        self.step_fused = lambda *a, src_mem=None, src_mask=None: \
            _step_fused(self.params, *a, self.mask, src_mem, src_mask)
        self._topk = jax.jit(lambda c, i, m: hier_topk(c, i, m, beam))

        def propose(params, root_vecs, mask, u_seq, pin_op, pin_clab,
                    pin_ilab, tabs):
            return model.apply(
                params, root_vecs, mask, u_seq, pin_op, pin_clab, pin_ilab,
                tabs, beam,
                method=lambda m, *a: m._decoder().dec_propose(*a))
        _propose = jax.jit(propose)
        self.propose = lambda rv, u, po, pc, pi, tabs: \
            _propose(self.params, rv, self.mask, u, po, pc, pi, tabs)

    def topk(self, cls_scores, icls_scores):
        return self._topk(cls_scores, icls_scores, self.mask)


class HierDecodeKernel:
    """Jitted step functions for the hierarchical decoder."""

    def __init__(self, model, params, vocab_mask: np.ndarray, beam: int = 5,
                 ke: Optional[int] = None, a_budget: Optional[int] = None,
                 eg_budget: Optional[int] = None,
                 nbg_budget: Optional[int] = None):
        self.params = params
        self.mask = jnp.asarray(vocab_mask)
        self.beam = beam
        # static row budgets for the propose scan (vocab/data-derived
        # bounds; None keeps hdec_propose's conservative defaults).  The
        # scan carries (1+B·Eg)-row LSTM graph states and a (1+B·A)-row
        # atom table through every step, so oversized budgets cost real
        # HBM traffic per step; undersized ones are SAFE — a sample whose
        # graft would outrun its budget is poisoned in-scan and falls
        # back to the exact host path (see hdec_propose's ovf guard).
        self.ke = ke
        self.a_budget = a_budget
        self.eg_budget = eg_budget
        self.nbg_budget = nbg_budget

        # params/mask as runtime arguments — see MotifDecodeKernel for why
        # closure-captured arrays make lowering take minutes
        def dec(name, static_argnums=()):
            def f(params, *args):
                return model.apply(
                    params, *args,
                    method=lambda m, *a: getattr(m._decoder(), name)(*a))
            jf = jax.jit(f, static_argnums=tuple(1 + i for i in static_argnums))
            return lambda *a: jf(self.params, *a)

        self.init_state = dec('hdec_init', static_argnums=(0, 1, 2, 3))
        self.graph_topo = dec('hdec_graph_topo')
        self.mess_update = dec('hdec_mess_update')
        self.assm = dec('hdec_assm')

        # batched assembly scoring: one device call scores every queued
        # multi-candidate case of a decode step (the serial path pays one
        # relay round-trip per molecule per step)
        def assm_batch_f(params, state, cand, icls_ids, n_icls, nth, ctx):
            def one(c, ic, n, nt, cx):
                return model.apply(
                    params, state, c, ic, n, nt, cx,
                    method=lambda m, *a: m._decoder().hdec_assm(*a))
            return jax.vmap(one)(cand, icls_ids, n_icls, nth, ctx)
        _assm_batch = jax.jit(assm_batch_f)
        self.assm_batch = lambda *a: _assm_batch(self.params, *a)

        def fused(params, state, *args):
            *rest, mask = args
            return model.apply(
                params, state, *rest, mask, beam,
                method=lambda m, *a: m._decoder().hdec_mess_cls_topk(*a))
        _mess_cls_topk = jax.jit(fused)
        self.mess_cls_topk = \
            lambda *a: _mess_cls_topk(self.params, *a, self.mask)

        def step(params, state, *args):
            *rest, mask = args
            return model.apply(
                params, state, *rest, mask, beam,
                method=lambda m, *a: m._decoder().hdec_step_fused(*a))
        _step_fused = jax.jit(step)
        self.step_fused = lambda *a: _step_fused(self.params, *a, self.mask)

        ke_kw = {}
        for k, v in (('KE', ke), ('A', a_budget), ('Eg', eg_budget),
                     ('NBG', nbg_budget)):
            if v is not None:
                ke_kw[k] = v

        def propose(params, root_vecs, mask, u_seq, tabs):
            return model.apply(
                params, root_vecs, mask, u_seq, tabs, beam,
                method=lambda m, *a: m._decoder().hdec_propose(*a, **ke_kw))
        _propose = jax.jit(propose)
        self.propose = lambda rv, u_seq, tabs: _propose(
            self.params, rv, self.mask, u_seq, tabs)


def decode_hier(model, params, vocab: PairVocab, avocab: Vocab,
                root_vecs: np.ndarray, greedy: bool = True,
                max_decode_step: int = 150, beam: int = 5,
                max_nodes: int = 400, max_edges: int = 500,
                rng: Optional[np.random.Generator] = None,
                log_steps: bool = False,
                kn: int = 32, ke: int = 72, cand_cap: int = 24):
    """Batched autoregressive decode for the hierarchical models (reference
    HierMPNDecoder.decode, decoder.py:303-472).  Same host/device split as
    ``decode_motif`` plus the atom-level state: each step refreshes the
    frontier clusters' atom hiddens on device, and assembly candidates are
    scored against them (candidate-dependent, unlike the motif decoder)."""
    rng = rng or np.random.default_rng(0)
    _check_no_attention(model)
    root_vecs = jnp.asarray(root_vecs)
    batch_size = root_vecs.shape[0]
    results = [[] for _ in range(batch_size)]

    tree = IncTree(batch_size, max_nodes=max_nodes, max_edges=max_edges,
                   max_sub_nodes=kn)
    graph = IncGraph(avocab, batch_size, max_nodes=max_nodes,
                     max_edges=max_edges + 100)
    stack: List[List[int]] = [[] for _ in range(batch_size)]

    kern = _get_kernel(HierDecodeKernel, model, params, vocab.mask, beam)

    # root prediction: cls/icls heads on the latent-derived init vector
    # (reference decoder.py:313-324)
    def root_heads(rv):
        return model.apply(
            params, rv,
            method=lambda m, v: (
                m._decoder().clsNN(jnp.concatenate(
                    [m._decoder().root_vecs_to_hidden(v), v], axis=-1), True),
                m._decoder().iclsNN(jnp.concatenate(
                    [m._decoder().root_vecs_to_hidden(v), v], axis=-1), True)))
    cls_scores, icls_scores = jax.jit(root_heads)(root_vecs)
    root_cls = np.asarray(jnp.argmax(cls_scores, axis=-1))
    icls_masked = np.asarray(icls_scores) + vocab.get_mask(root_cls)
    root_icls = icls_masked.argmax(axis=-1)

    super_root = tree.add_node()
    for b in range(batch_size):
        clab, ilab = int(root_cls[b]), int(root_icls[b])
        results[b].append({'root': vocab.get_smiles(clab),
                           'Attaching Fragment': {
                               'mol': clab,
                               'attachment': vocab.get_ismiles(ilab)}})
        root_idx = tree.add_node((clab, ilab))
        tree.add_edge(super_root, root_idx)
        stack[b].append(root_idx)
        new_atoms, new_bonds, attached = graph.add_mol(
            b, vocab.get_ismiles(ilab), [], 0)
        tree.register_cgraph(root_idx, new_atoms, new_bonds, attached)

    n_tree_rows = max_edges * batch_size
    n_graph_rows = (max_edges + 100) * batch_size
    n_gnodes = max_nodes * batch_size
    n_tnodes = max_nodes * batch_size
    state = kern.init_state(n_tree_rows, n_graph_rows, n_gnodes, n_tnodes,
                            root_vecs)
    max_nb = tree.max_nb
    g_nb = graph.max_nb

    u_greedy = np.full(batch_size, 0.5, dtype=np.float32)

    for t in range(max_decode_step):
        for r in results:
            r.append({})
        batch_list = [b for b in range(batch_size) if stack[b]]
        if not batch_list:
            break

        # ---- atom-level refresh of frontier clusters --------------------
        g_rows = np.zeros((batch_size, ke), dtype=np.int32)
        g_nodes = np.zeros((batch_size, kn), dtype=np.int32)
        for b in batch_list:
            v = stack[b][-1]
            edges = tree.get_cluster_edges([v])[:ke]
            atoms = tree.get_cluster_nodes([v])[:kn]
            g_rows[b, :len(edges)] = edges
            g_nodes[b, :len(atoms)] = atoms
        fr = g_rows.reshape(-1)
        fn = g_nodes.reshape(-1)

        # frontier readout + speculative branch inputs (ONE device call per
        # step; see hdec_step_fused / dec_step_fused docstrings)
        v_nodes = np.zeros(batch_size, dtype=np.int32)
        v_clab = np.zeros(batch_size, dtype=np.int32)
        v_ilab = np.zeros(batch_size, dtype=np.int32)
        v_cg = np.zeros((batch_size, kn), dtype=np.int32)
        v_ag = np.zeros((batch_size, max_nb), dtype=np.int32)
        can_exp = np.zeros(batch_size, dtype=bool)
        new_rows = np.zeros(batch_size, dtype=np.int32)
        bt_valid = np.zeros(batch_size, dtype=bool)
        bt_pos = np.zeros(batch_size, dtype=np.int32)
        bt_bg = np.zeros((batch_size, max_nb), dtype=np.int32)
        first = tree.reserve_edges(len(batch_list))
        reserved = {}
        for r_i, b in enumerate(batch_list):
            v = stack[b][-1]
            row = first + r_i
            reserved[b] = row
            new_rows[b] = row
            v_nodes[b] = v
            v_clab[b] = tree.fnode[v, 0]
            v_ilab[b] = tree.fnode[v, 1]
            v_cg[b] = tree.cgraph[v][:kn]
            v_ag[b] = tree.agraph[v]
            can_exp[b] = tree.can_expand(v)
            if len(stack[b]) >= 2:
                top = stack[b][-2]
                bt_valid[b] = True
                bt_pos[b] = min(tree.in_degree(top), 19)
                rev = tree.edge_dict.get((top, v), 0)
                bg = tree.agraph[v].copy()
                bg[bg == rev] = 0
                bt_bg[b] = bg
        u = u_greedy if greedy else rng.random(batch_size).astype(np.float32)

        state, packed = kern.step_fused(
            state, jnp.asarray(g_rows),
            jnp.asarray(graph.fmess[fr, 0].reshape(g_rows.shape)),
            jnp.asarray(graph.fmess[fr, 1].reshape(g_rows.shape)),
            jnp.asarray(graph.fmess[fr, 2].reshape(g_rows.shape)),
            jnp.asarray(graph.bgraph[fr].reshape(batch_size, ke, g_nb)),
            jnp.asarray(g_nodes),
            jnp.asarray(graph.fnode[fn, 0].reshape(g_nodes.shape)),
            jnp.asarray(graph.agraph[fn].reshape(batch_size, kn, g_nb)),
            jnp.asarray(v_nodes), jnp.asarray(v_clab),
            jnp.asarray(v_ilab), jnp.asarray(v_cg), jnp.asarray(v_ag),
            jnp.asarray(can_exp), jnp.asarray(u), jnp.asarray(new_rows),
            jnp.asarray(v_ag), jnp.asarray(bt_valid),
            jnp.asarray(bt_pos), jnp.asarray(bt_bg), root_vecs)
        # ONE host sync / tunnel round-trip per step
        packed = np.asarray(packed)
        topo_p = 1.0 / (1.0 + np.exp(-packed[:, 0]))
        choose = packed[:, 1] > 0.5
        scores = packed[:, 2:2 + beam]
        cls_topk = packed[:, 2 + beam:2 + 2 * beam].astype(np.int32)
        icls_topk = packed[:, 2 + 2 * beam:2 + 3 * beam].astype(np.int32)

        # ---- replay the device's branch choice on the host tree ---------
        expand_bids = []
        for b in batch_list:
            results[b][-1]['Generate fragment'] = float(topo_p[b])
            row = reserved[b]
            if choose[b]:
                parent = stack[b][-1]
                new_node = tree.add_node()
                tree.add_edge(parent, new_node, (parent, new_node, 0), row=row)
                stack[b].append(new_node)
                expand_bids.append(b)
            else:
                child = stack[b].pop()
                if stack[b]:
                    top = stack[b][-1]
                    nth_child = tree.in_degree(top)
                    tree.add_edge(child, top, (child, top, nth_child), row=row)

        def pack_cands(smiles, inter_cands, anchor_smiles, nth_child):
            icls_ids = np.zeros(2, dtype=np.int32)
            for j, a_s in enumerate(anchor_smiles[:2]):
                try:
                    icls_ids[j] = vocab[(smiles, a_s)][1]
                except KeyError:
                    pass
            cand_arr = np.zeros((cand_cap, 2), dtype=np.int32)
            use = inter_cands[:cand_cap]
            for j, c in enumerate(use):
                cand_arr[j, 0] = c[0]
                cand_arr[j, 1] = c[-1]
            return (cand_arr, icls_ids, min(len(anchor_smiles), 2),
                    min(nth_child, 19), use)

        def order_cands(sc, use):
            order = np.argsort(-sc[:len(use)], kind='stable')
            return [list(use[j]) for j in order]

        prescored = {}
        if greedy:
            # batch-score every molecule's FIRST beam attempt in ONE device
            # call (per-sample enumeration is independent of the other
            # samples' later assemblies); retries fall back to the serial
            # scorer below, which is rare after the first attempt
            queue = []
            for b in expand_bids:
                fa_node = stack[b][-2]
                clab = int(cls_topk[b][0])
                ilab = int(icls_topk[b][0])
                try:
                    smiles = vocab.get_smiles(clab)
                    ismiles = vocab.get_ismiles(ilab)
                    fa_cluster, _, fa_used = tree.get_cluster(fa_node)
                    inter_cands, anchor_smiles, _ = graph.get_assm_cands(
                        fa_cluster, fa_used, ismiles)
                except Exception:
                    continue
                if len(inter_cands) > 1:
                    nth_child = tree.in_degree(fa_node)
                    queue.append((b, clab, ilab,
                                  pack_cands(smiles, inter_cands,
                                             anchor_smiles, nth_child)))
            if queue:
                sc = np.asarray(kern.assm_batch(
                    state,
                    jnp.asarray(np.stack([q[3][0] for q in queue])),
                    jnp.asarray(np.stack([q[3][1] for q in queue])),
                    jnp.asarray([q[3][2] for q in queue]),
                    jnp.asarray([q[3][3] for q in queue]),
                    root_vecs[np.asarray([q[0] for q in queue])]))
                for (b, clab, ilab, packed), row in zip(queue, sc):
                    prescored[(b, clab, ilab)] = order_cands(row, packed[4])

        def score_cands(b, smiles, inter_cands, anchor_smiles, nth_child):
            # device-scored candidate ranking against current atom hiddens;
            # first-attempt orders come from the batched pre-scoring above
            cand_arr, icls_ids, n_icls, nth, use = pack_cands(
                smiles, inter_cands, anchor_smiles, nth_child)
            sc = np.asarray(kern.assm(
                state, jnp.asarray(cand_arr), jnp.asarray(icls_ids),
                jnp.asarray(n_icls), jnp.asarray(nth), root_vecs[b]))
            return order_cands(sc, use)

        for b in expand_bids:
            new_node, fa_node = stack[b][-1], stack[b][-2]
            cls_beam = _pick_beam(greedy, beam, scores[b], rng)
            pre = {(clab, ilab): order
                   for (bb, clab, ilab), order in prescored.items()
                   if bb == b}

            def scorer(bb, smiles, inter_cands, anchor_smiles, nth_child,
                       ilab_cur, _pre=pre, _b=b):
                # the pre dict holds at most the beam-0 attempt; reuse it
                # ONLY for the same fine label — scores depend on the
                # child's anchor embeddings, so two icls with identical
                # candidate SETS still order them differently
                for (_, ilab_p), order in _pre.items():
                    if ilab_p == ilab_cur and \
                            len(order) == len(inter_cands) and \
                            sorted(map(tuple, order)) == \
                            sorted(map(tuple, inter_cands)):
                        return order
                return score_cands(_b, smiles, inter_cands, anchor_smiles,
                                   nth_child)

            ok = _try_assemble(tree, graph, vocab, b, new_node, fa_node,
                               cls_beam, cls_topk[b], icls_topk[b],
                               scorer,
                               results[b][-1] if log_steps else None)
            if not ok:
                _forced_backtrack(tree, stack, b)

    smiles_out = graph.get_smiles()
    while len(smiles_out) < batch_size:
        smiles_out.append(None)
    return results, smiles_out


_ASSM_TABLES_CACHE: dict = {}

ORACLE_SLOTS = 24          # motifs larger than this get no-opinion treatment
ORACLE_ATOMS = 1024        # per-sample atom-id capacity of the device oracle

# diagnostics of the LAST decode_motif_turbo call: rounds used, batch size,
# per-round pending counts, and how many samples fell back to the exact
# host-interleaved path.  With an exact oracle a trained model resolves in
# 1 round with 0 fallbacks (asserted by tests/test_decode.py).
TURBO_STATS: dict = {}
_FV_BIG = 63               # "unlimited valence" sentinel (max_valence == 0)


def _assm_tables(vocab: PairVocab, avocab: Vocab):
    """Per-icls motif tables for the device-side assembly oracle (see
    ``MotifDecoder.dec_propose``) — a tensorised model of
    ``IncGraph.get_assm_cands`` + ``IncGraph.try_add_mol``:

    the candidate space is consecutive runs of the parent's cluster-atom
    LIST (reference inc_graph.py:287-301 — ``cluster2[i:i+inter_size]``,
    list order, not chemical adjacency), filtered by endpoint atom-type
    equality (``bond_match`` compares (symbol, charge) only,
    chemutils.py:120-123) and the used-atom set, then validated by the
    incremental valence test (``try_add_mol``).  All of that is
    computable per (parent icls, child icls) from static per-motif data
    plus two dynamic per-node vectors (slot used flags and slot free
    valences), which the decode scan carries.

    Arrays (all first-indexed by icls):
      n_at   atom count (0 for unparseable)
      isz    attachment size = len(attach_points)
      fail   structurally unattachable as a child (≠2 anchors when
             isz ∉ {1, 2}, reference inc_graph.py:304-314)
      noop   oracle abstains (motif too large / exotic atoms / isz > 2):
             feasibility defaults to "yes", divergences fall back to the
             host replay
      sym    the two anchor SMILES are equal → forward candidate
             enumeration only (inc_graph.py:318-323)
      stype  [S] avocab type index per cluster slot (−1 pad)
      bused  [S] used-at-birth flags (anchors + map-1 + interior atoms —
             ``add_mol`` returns them as attached, inc_graph.py:152-203)
      bfv    [S] free valence at birth: max_valence − motif-internal
             bonded valence − explicit Hs (``try_add_mol`` valence test);
             _FV_BIG where max_valence == 0 (unconstrained)
      adj    [S, S] motif-internal bond orders (the ``extra`` term for
             attach-attach bonds missing in the parent)
      appos  [2] slot indices of the two attachment endpoints
             (p0 == p1 for isz == 1)
      apbond bond order between the two endpoints inside the motif
      needs  [2] bond-order sum from each endpoint into NON-attach atoms
      ctype  [2] avocab type of each endpoint
    """
    import weakref
    hit = _ASSM_TABLES_CACHE.get(id(vocab))
    if hit is not None and hit[0]() is vocab:
        return hit[1]
    from ..chem import get_mol_shared
    from ..chem.elements import max_valence
    from ..graph.chemutils import get_anchor_smiles
    from .inc_graph import is_anchor_self
    S = ORACLE_SLOTS
    n = vocab.size()[1]
    n_at = np.zeros(n, np.int32)
    isz_t = np.ones(n, np.int32)
    fail = np.zeros(n, bool)
    noop = np.zeros(n, bool)
    sym = np.zeros(n, bool)
    stype = np.full((n, S), -1, np.int32)
    bused = np.zeros((n, S), bool)
    bfv = np.zeros((n, S), np.int32)
    adj = np.zeros((n, S, S), np.int8)
    appos = np.zeros((n, 2), np.int32)
    apbond = np.zeros(n, np.int32)
    needs = np.zeros((n, 2), np.int32)
    ctype = np.full((n, 2), -1, np.int32)

    def type_idx(a):
        try:
            return avocab[(a.symbol, a.charge)]
        except KeyError:
            return -1

    for i in range(n):
        try:
            emol = get_mol_shared(vocab.get_ismiles(i))
        except Exception:
            emol = None
        if emol is None:
            fail[i] = True
            noop[i] = True
            continue
        na = emol.num_atoms
        n_at[i] = min(na, S)
        if na > S:
            noop[i] = True
            continue
        types = [type_idx(a) for a in emol.atoms]
        if any(t < 0 for t in types):
            noop[i] = True
        stype[i, :na] = types
        for j, a in enumerate(emol.atoms):
            # birth-used = everything except map-2 atoms (inc_graph.py:152-203)
            # — except singletons, whose attached list is reset to []
            # (inc_graph.py:199-200)
            bused[i, j] = a.map_num != 2 and na > 1
            mv = max_valence(a.symbol, a.charge)
            if mv == 0:
                bfv[i, j] = _FV_BIG
            else:
                # NO explicit-H subtraction: grafted atoms are created by
                # copy_atom, which keeps symbol/charge only (chem/api.py:126)
                # — the shared mol's atoms always have explicit_h None, and
                # try_add_mol's valence test sees (explicit_h or 0) == 0
                bonded = sum(b.order for b in emol.bonds
                             if b.a1 == j or b.a2 == j)
                bfv[i, j] = max(mv - bonded, 0)
        for b in emol.bonds:
            adj[i, b.a1, b.a2] = b.order
            adj[i, b.a2, b.a1] = b.order

        if na == 1:
            isz_t[i] = 1
            appos[i] = (0, 0)
            ctype[i] = (types[0], types[0])
            continue
        attach = [j for j, a in enumerate(emol.atoms) if a.map_num == 1]
        isz = len(attach)
        if isz == 1:
            a0 = a1 = attach[0]
        elif isz == 2:
            a0, a1 = attach
            try:
                s0 = get_anchor_smiles(emol, a0, by_index=True)
                s1 = get_anchor_smiles(emol, a1, by_index=True)
                sym[i] = s0 == s1
            except Exception:
                noop[i] = True
        else:
            anchors = [a for a in attach if is_anchor_self(emol, a, attach)]
            if len(anchors) != 2:
                fail[i] = True
                continue
            a0, a1 = anchors
            noop[i] = True           # >2-point attachment: oracle abstains
        isz_t[i] = max(isz, 1)
        appos[i] = (a0, a1)
        ctype[i] = (types[a0], types[a1])
        ap_set = set(attach)
        for b in emol.bonds:
            for (x, y) in ((b.a1, b.a2), (b.a2, b.a1)):
                if x in (a0, a1) and y not in ap_set:
                    needs[i, 0 if x == a0 else 1] += b.order
                    if isz == 1:
                        break            # single endpoint: count once
        apbond[i] = adj[i, a0, a1] if isz >= 2 else 0

    # newrank[i, j]: when motif i is grafted, non-attach atoms receive
    # sequential new mol ids in motif-atom order (add_mol's enumerate loop,
    # inc_graph.py:155-178) — newrank is each slot's rank among them.
    # is_att[i, j]: slot j is an attachment endpoint (maps onto an existing
    # parent atom instead of allocating a new one).
    newrank = np.zeros((n, S), np.int32)
    is_att = np.zeros((n, S), bool)
    for i in range(n):
        att = {int(appos[i, 0])}
        if isz_t[i] >= 2:
            att.add(int(appos[i, 1]))
        r = 0
        for j in range(S):
            if j in att and n_at[i] > 0:
                is_att[i, j] = True
            else:
                newrank[i, j] = r
                r += 1

    # ---- hier-decode tables (device-side add_mol + assembly scoring) ----
    # av      [S]  atom-vocab index per slot (add_mol's one-hot id;
    #              KeyError -> 0, inc_graph.py:165-168)
    # map1    [S]  ismiles anchor mark (map_num == 1)
    # dst_att [S]  slot is in add_mol's `attached` when bonds are added
    #              (attach endpoints + map-1 atoms) — selects nth_child on
    #              the edge rows (inc_graph.py:190-193)
    # b_a/b_b/b_bt [BMAX] motif bond list in emol order (slot, slot, bond
    #              type index); b_anch marks the anchor-pair bond (skipped
    #              when the parent already has it, inc_graph.py:184,194-195)
    # nbond   bond count
    # a_icls  [2]  fine labels of the anchor smiles (pack_cands, decode.py)
    # n_anch  number of anchors (1 or 2)
    # poison  the device CANNOT mirror this graft's atom/edge bookkeeping
    #         (unparseable / >S atoms / >2-point attachment) — a sample that
    #         grafts one must fall back to the exact path
    from ..graph.mol_graph import bond_type_index
    BMAX = S + 6
    av = np.zeros((n, S), np.int32)
    map1 = np.zeros((n, S), bool)
    dst_att = np.zeros((n, S), bool)
    b_a = np.zeros((n, BMAX), np.int32)
    b_b = np.zeros((n, BMAX), np.int32)
    b_bt = np.zeros((n, BMAX), np.int32)
    b_anch = np.zeros((n, BMAX), bool)
    nbond = np.zeros(n, np.int32)
    a_icls = np.zeros((n, 2), np.int32)
    n_anch = np.ones(n, np.int32)
    poison = np.zeros(n, bool)
    for i in range(n):
        try:
            emol = get_mol_shared(vocab.get_ismiles(i))
        except Exception:
            emol = None
        if emol is None or emol.num_atoms > S:
            poison[i] = True
            continue
        na = emol.num_atoms
        attach = [j for j, a in enumerate(emol.atoms) if a.map_num == 1]
        if na > 1 and len(attach) > 2:
            poison[i] = True
            continue
        for j, a in enumerate(emol.atoms):
            try:
                av[i, j] = avocab[(a.symbol, a.charge)]
            except KeyError:
                av[i, j] = 0
            map1[i, j] = a.map_num == 1
            dst_att[i, j] = is_att[i, j] or map1[i, j]
        ap = (int(appos[i, 0]), int(appos[i, 1]))
        for k, b in enumerate(emol.bonds[:BMAX]):
            b_a[i, k], b_b[i, k] = b.a1, b.a2
            b_bt[i, k] = bond_type_index(emol, b)
            b_anch[i, k] = isz_t[i] >= 2 and {b.a1, b.a2} == set(ap)
        nbond[i] = min(len(emol.bonds), BMAX)
        if len(emol.bonds) > BMAX:
            poison[i] = True
        # anchor fine labels (decode.pack_cands: vocab[(smiles, anchor)])
        smiles = vocab.vocab[i][0]         # (smiles, ismiles) pair list
        isz = int(isz_t[i])
        if na == 1 or isz == 1:
            anchor_smi = [vocab.get_ismiles(i)]
        else:
            try:
                anchor_smi = [
                    get_anchor_smiles(emol, int(appos[i, 0]), by_index=True),
                    get_anchor_smiles(emol, int(appos[i, 1]), by_index=True)]
            except Exception:
                anchor_smi = []
                poison[i] = True
        n_anch[i] = min(len(anchor_smi), 2) or 1
        for k, a_s in enumerate(anchor_smi[:2]):
            try:
                a_icls[i, k] = vocab[(smiles, a_s)][1]
            except Exception:
                a_icls[i, k] = 0

    # ---- packed views: ONE gather per index role inside the decode scans.
    # The propose scan body is op-LAUNCH-bound on TPU (~1.5k primitives per
    # step); every tabs['x'][idx] is a separate gather primitive, so the
    # columns each role reads are packed into one wide int32 row:
    #   cpack  [V, 10]       child-candidate columns (feas_for / c_track):
    #                        isz fail noop sym ctype0 ctype1 needs0 needs1
    #                        apbond poison
    #   ppack  [V, 3+7S]     parent columns: n_at appos0 appos1 | stype(S)
    #                        | tnxt(S) tprv(S) abnxt(S) abprv(S) nxts(S)
    #                        prvs(S) — the fwd/rev cluster-ring neighbour
    #                        slot of s and its type/motif-bond-order are
    #                        STATIC per icls (they depend only on n_at and
    #                        the motif), so they are precomputed here
    #                        instead of re-gathered every scan step
    #   bpack  [V, 8+5S]     child-birth columns: n_at isz noop apbond
    #                        needs0 appos0 appos1 nbond | bused(S) bfv(S)
    #                        newrank(S) is_att(S) av(S)
    # Unpacked tables stay for the host replay / non-scan callers.
    cpack = np.stack([isz_t, fail, noop, sym, ctype[:, 0], ctype[:, 1],
                      needs[:, 0], needs[:, 1], apbond, poison],
                     axis=1).astype(np.int32)
    sidx_np = np.arange(S)[None, :]
    pn_np = n_at[:, None]
    nxt_np = np.where(sidx_np + 1 >= pn_np, 0, sidx_np + 1).astype(np.int32)
    prv_np = np.where(sidx_np == 0, np.maximum(pn_np - 1, 0),
                      sidx_np - 1).astype(np.int32)
    adj32 = adj.astype(np.int32)
    ppack = np.concatenate(
        [np.stack([n_at, appos[:, 0], appos[:, 1]], axis=1), stype,
         np.take_along_axis(stype, nxt_np, 1),
         np.take_along_axis(stype, prv_np, 1),
         np.take_along_axis(adj32, nxt_np[:, :, None], 2)[:, :, 0],
         np.take_along_axis(adj32, prv_np[:, :, None], 2)[:, :, 0],
         nxt_np, prv_np], axis=1).astype(np.int32)
    bpack = np.concatenate(
        [np.stack([n_at, isz_t, noop, apbond, needs[:, 0], appos[:, 0],
                   appos[:, 1], nbond], axis=1),
         bused, bfv, newrank, is_att, av], axis=1).astype(np.int32)
    # apack [V, 3]: a_icls0 a_icls1 n_anch (hier assembly scoring);
    # bondpack [V, BMAX, 4]: b_a b_b b_bt b_anch (hier graft bond loop —
    # gathered ONCE per step instead of 4 gathers per fori_loop iteration)
    apack = np.concatenate([a_icls, n_anch[:, None]], axis=1).astype(np.int32)
    bondpack = np.stack([b_a, b_b, b_bt, b_anch.astype(np.int32)],
                        axis=2).astype(np.int32)
    tabs = {k: jnp.asarray(v) for k, v in dict(
        n_at=n_at, isz=isz_t, fail=fail, noop=noop, sym=sym, stype=stype,
        bused=bused, bfv=bfv, adj=adj.astype(np.int32), appos=appos,
        apbond=apbond, needs=needs, ctype=ctype, newrank=newrank,
        is_att=is_att, av=av, map1=map1, dst_att=dst_att, b_a=b_a, b_b=b_b,
        b_bt=b_bt, b_anch=b_anch, nbond=nbond, a_icls=a_icls, n_anch=n_anch,
        poison=poison, cpack=cpack, ppack=ppack, bpack=bpack, apack=apack,
        bondpack=bondpack).items()}
    # evict entries whose vocab has died — keyed by id(), a dead entry's
    # id can be reused by a NEW vocab, and without eviction the multi-MB
    # device tables of every dead vocab stay resident (same leak class as
    # the pre-LRU _KERNEL_CACHE)
    for k in [k for k, (ref, _) in _ASSM_TABLES_CACHE.items()
              if ref() is None]:
        del _ASSM_TABLES_CACHE[k]
    _ASSM_TABLES_CACHE[id(vocab)] = (weakref.ref(vocab), tabs)
    return tabs


class _ReplayState:
    """Live single-sample chemistry state carried across turbo rounds.

    The pinned prefix of a re-entering sample replays DETERMINISTICALLY
    (every step before the divergence is pinned, and the divergence
    resolution itself was already executed when it was recorded as the
    last pin), so instead of rebuilding tree/graph from scratch each
    round, the resolved state lives here and the next round's replay
    resumes at ``t = len(pins)``."""

    __slots__ = ('tree', 'graph', 'stack', 'pins', 'seeded')

    def __init__(self, vocab, avocab, max_nodes, max_edges, max_nb):
        self.tree = IncTree(1, max_nodes=max_nodes, max_edges=max_edges,
                            max_nb=max_nb)
        self.graph = IncGraph(avocab, 1, max_nodes=max_nodes,
                              max_edges=max_edges + 100)
        self.stack: List[int] = []
        self.pins: List[tuple] = []
        self.seeded = False


def _replay_pinned(trace_b, root_cls_b, root_icls_b, rs: "_ReplayState",
                   vocab: PairVocab, beam: int, final: bool = True):
    """Replay one sample's device decision trace with real chemistry,
    resuming from ``rs`` (state after the last resolved divergence; see
    ``_ReplayState``).  Pin ops: 1 = expand committing (clab, ilab),
    2 = backtrack, 3 = expand then forced backtrack — see
    ``MotifDecoder.dec_propose``.

    Free (un-pinned) steps follow the trace and commit the device's beam-0
    speculation.  Returns one of
      ``('done', smiles)``  — replay completed;
      ``('diverge', None)`` — chemistry rejected beam-0 at some step; the
        divergence is resolved the exact path's way (beam retry then
        forced backtrack, reference decoder.py:1037-1089), recorded as the
        last pin in ``rs.pins``, and ``rs`` holds the post-resolution
        state — re-enter the device with ``rs.pins``;
      ``('continue', None)`` — the trace ran out (a short ladder rung)
        with the DFS stack still alive and ``final=False``: every executed
        step is pinned in ``rs.pins``; re-enter at a longer rung.  With
        ``final=True`` the step budget IS max_decode_step and the partial
        molecule is extracted as-is (reference decoder.py:960 caps t the
        same way)."""
    tree, graph, stack = rs.tree, rs.graph, rs.stack

    if not rs.seeded:
        rs.seeded = True
        # first round for this sample: seed the root motif
        clab, ilab = int(root_cls_b), int(root_icls_b)
        super_root = tree.add_node()
        root_idx = tree.add_node((clab, ilab))
        tree.add_edge(super_root, root_idx)
        stack.append(root_idx)
        try:
            new_atoms, new_bonds, attached = graph.add_mol(
                0, vocab.get_ismiles(ilab), [], 0)
        except Exception:
            # ungraftable root fragment: the reference has no root retry
            # either (decoder.py:936-948 would raise) — yield no molecule
            return 'done', None
        tree.register_cgraph(root_idx, new_atoms, new_bonds, attached)

    T = trace_b.shape[0]
    for t in range(len(rs.pins), T):
        if not stack:
            break
        # free step: follow the trace
        choose = trace_b[t, 1] > 0.5
        if choose:
            parent = stack[-1]
            new_node = tree.add_node()
            tree.add_edge(parent, new_node, (parent, new_node, 0))
            stack.append(new_node)
            cls_topk = trace_b[t, 2 + beam:2 + 2 * beam].astype(np.int32)
            icls_topk = trace_b[t, 2 + 2 * beam:2 + 3 * beam].astype(np.int32)
            dev_j = int(trace_b[t, 2 + 3 * beam])   # −1 = predicted op-3
            # ground truth: first chemically-valid beam, reference order
            # (decoder.py:1037-1077); commits the valid choice in place
            ok = _try_assemble(tree, graph, vocab, 0, new_node, parent,
                               range(beam), cls_topk, icls_topk, None, None)
            if ok is None:
                # all beams fail -> forced backtrack (decoder.py:1079-1089)
                _forced_backtrack(tree, [stack], 0)
                rs.pins.append((3, int(cls_topk[0]), int(icls_topk[0])))
                if dev_j == -1:
                    continue      # the oracle predicted it: trace still valid
                return 'diverge', None
            rs.pins.append((1, int(ok[0]), int(ok[1])))
            if 0 <= dev_j < beam and int(cls_topk[dev_j]) == ok[0] \
                    and int(icls_topk[dev_j]) == ok[1]:
                continue          # device committed the same motif
            return 'diverge', None
        else:
            child = stack.pop()
            if stack:
                top = stack[-1]
                tree.add_edge(child, top, (child, top, tree.in_degree(top)))
            rs.pins.append((2, 0, 0))
    if stack and not final:
        return 'continue', None
    smiles = graph.get_smiles()
    return 'done', (smiles[0] if smiles else None)



def decode_motif_turbo(model, params, vocab: PairVocab, avocab: Vocab,
                       root_vecs: np.ndarray, greedy: bool = True,
                       max_decode_step: int = 150, beam: int = 5,
                       max_nodes: int = 400, max_edges: int = 500,
                       rng: Optional[np.random.Generator] = None,
                       log_steps: bool = False, max_rounds: int = 16,
                       ladder: Optional[tuple] = None,
                       chunk: Optional[int] = None):
    """Device-resident speculative decode (motif family).

    ONE device call runs the whole autoregressive loop as a ``lax.scan``
    (``MotifDecoder.dec_propose``) and ONE fetch brings back the full
    decision trace; the host replays it with real chemistry.  Samples where
    chemistry rejects the speculated beam-0 motif re-enter the next ROUND
    with their executed prefix pinned (the divergence resolved the exact
    path's way — beam retry or forced backtrack, reference
    decoder.py:1037-1089); each round resolves at least one further
    divergence per unresolved sample, so the loop pays one device
    call + one fetch per round instead of one per decode step.  Trained
    models replay mostly clean (measured ~70-90% of molecules in round 0).
    Stochastic decoding keeps the exact path (its candidate shuffle
    consumes host RNG per step).

    ``ladder``: scan-length rungs below ``max_decode_step``.  Most
    molecules finish their DFS well under the 150-step budget, so round 0
    proposes at the first rung; samples whose stack is still alive when a
    short trace runs out re-enter at a longer rung with the executed
    prefix pinned — identical results, ~T_rung/T of the scan cost for the
    common case.  ``None`` picks a per-backend default: ``(64,)`` on CPU,
    where scan cost is linear in T, and ``()`` on TPU, where the scan is
    latency-bound (measured: T=150 costs about the same as T=64, so an
    extra rung is a pure extra device call).

    ``chunk``: decode in pipelined chunks of this many samples.  All
    chunks' round-0 propose scans are dispatched before the first fetch
    (JAX dispatch is async), so the device works through chunk k+1 while
    the host replays chunk k's trace with real chemistry — host replay
    time is hidden behind device time for all but the last chunk.
    ``None`` = one chunk (the whole batch).

    Returns (results, smiles) like ``decode_motif``; per-step logs are only
    produced for fallback samples (``log_steps`` applies there)."""
    if not greedy:
        return decode_motif(model, params, vocab, avocab, root_vecs,
                            greedy=False, max_decode_step=max_decode_step,
                            beam=beam, max_nodes=max_nodes,
                            max_edges=max_edges, rng=rng, log_steps=log_steps)
    _check_no_attention(model)
    root_vecs = np.asarray(root_vecs)
    batch_size = root_vecs.shape[0]
    T = max_decode_step
    kern = _get_kernel(MotifDecodeKernel, model, params, vocab.mask, beam)
    tabs = _assm_tables(vocab, avocab)
    if ladder is None:
        ladder = (64,) if jax.default_backend() == 'cpu' else ()

    states = [_ReplayState(vocab, avocab, max_nodes, max_edges, 12)
              for _ in range(batch_size)]
    smiles_out: List[Optional[str]] = [None] * batch_size
    results: List[list] = [[] for _ in range(batch_size)]
    TURBO_STATS.update(rounds=0, batch=batch_size, fallbacks=0,
                       pending_per_round=[], rungs=[])
    rungs = sorted({min(r, T) for r in ladder} | {T})

    if chunk is None or chunk >= batch_size:
        chunk = batch_size
    chunk_pending = [list(range(i, min(i + chunk, batch_size)))
                     for i in range(0, batch_size, chunk)]
    # a short last chunk is padded up to the shared chunk width inside
    # dispatch (cols repeat pending[0]) so the whole call compiles ONE
    # round-0 scan shape
    chunks = [{'pending': p, 'rnd': 0, 'size': chunk} for p in chunk_pending]

    def dispatch(ch):
        """Queue one propose round for a chunk on the device (async — no
        fetch happens here)."""
        pending, rnd = ch['pending'], ch['rnd']
        # scan length for this round: the smallest rung every pending
        # sample's pinned prefix fits under (strictly — re-entry must make
        # progress), else the full budget
        max_pins = max((len(states[b].pins) for b in pending), default=0)
        T_r = next((r for r in rungs if r > max_pins), T)
        ch['final'] = T_r == T
        TURBO_STATS['rungs'].append(T_r)
        # compact: later rounds run the propose scan only over still-pending
        # samples.  Per rung, at most THREE column shapes ever compile (the
        # chunk width, a short last-chunk width, and a 16-wide straggler
        # shape) — the scan is column-independent, and each extra shape
        # costs a full scan compile on the TPU
        n_p = len(pending)
        nb = 16 if (rnd and n_p <= 16 and ch['size'] > 16) else ch['size']
        cols = pending + [pending[0]] * (nb - n_p)
        rv_r = jnp.asarray(root_vecs[np.asarray(cols)])
        u_r = jnp.full((T_r, nb), 0.5, dtype=jnp.float32)
        pin_op = np.zeros((T_r, nb), dtype=np.int32)
        pin_clab = np.zeros((T_r, nb), dtype=np.int32)
        pin_ilab = np.zeros((T_r, nb), dtype=np.int32)
        for j, b in enumerate(cols[:n_p]):
            for t, (op, clab, ilab) in enumerate(states[b].pins):
                pin_op[t, j] = op
                pin_clab[t, j] = clab
                pin_ilab[t, j] = ilab
        ch['out'] = kern.propose(
            rv_r, u_r, jnp.asarray(pin_op), jnp.asarray(pin_clab),
            jnp.asarray(pin_ilab), tabs)
        for o in ch['out']:
            # start the device→host copy as soon as the scan finishes, so
            # the trace transfer overlaps the host's replay of earlier
            # chunks instead of serialising at np.asarray
            if hasattr(o, 'copy_to_host_async'):
                o.copy_to_host_async()
        ch['cols'], ch['n_p'] = cols, n_p
        ch['rnd'] = rnd + 1
        TURBO_STATS['rounds'] = max(TURBO_STATS['rounds'], ch['rnd'])
        TURBO_STATS['pending_per_round'].append(n_p)

    inflight = deque()
    for ch in chunks:                 # round-0 for every chunk, then fetch —
        dispatch(ch)                  # the device queue stays full while the
        inflight.append(ch)           # host replays earlier chunks
    exhausted: List[int] = []
    while inflight:
        ch = inflight.popleft()
        packed, root_cls, root_icls = ch['out']
        ch['out'] = None
        packed = np.asarray(packed)   # ONE host round-trip per round
        root_cls = np.asarray(root_cls)
        root_icls = np.asarray(root_icls)
        still = []
        for j, b in enumerate(ch['cols'][:ch['n_p']]):
            status, out = _replay_pinned(
                packed[:, j, :], root_cls[j], root_icls[j], states[b],
                vocab, beam, final=ch['final'])
            if status == 'done':
                smiles_out[b] = out
            else:         # 'diverge'/'continue': pins grew inside rs
                still.append(b)
        ch['pending'] = still
        if not still:
            continue
        if ch['rnd'] >= max_rounds:
            exhausted += still
        else:
            dispatch(ch)
            inflight.append(ch)

    TURBO_STATS['fallbacks'] = len(exhausted)
    if exhausted:
        # round cap hit: the stragglers have deep divergence chains, where
        # the exact batched path is cheaper (T per-step calls shared by all
        # stragglers vs one full scan PER divergence here)
        res2, sm2 = decode_motif(model, params, vocab, avocab,
                                 root_vecs[np.asarray(exhausted)],
                                 greedy=True, max_decode_step=max_decode_step,
                                 beam=beam, max_nodes=max_nodes,
                                 max_edges=max_edges, rng=rng,
                                 log_steps=log_steps)
        for j, b in enumerate(exhausted):
            smiles_out[b] = sm2[j]
            results[b] = res2[j]
    return results, smiles_out


def _hier_candidate(cluster, kind, slot):
    """Map the device's (kind, slot) candidate code to the host candidate
    atom run (get_assm_cands enumeration: kind 0 = 1-point or forward pair
    starting at ``slot``, kind 2 = reverse pair)."""
    n = len(cluster)
    if n == 0:
        return None
    if kind == 2:
        return [cluster[slot % n], cluster[(slot - 1) % n]]
    return [cluster[slot % n], cluster[(slot + 1) % n]]


def _replay_hier(trace_b, root_cls_b, root_icls_b, vocab: PairVocab,
                 avocab: Vocab, beam: int, max_nodes: int, max_edges: int):
    """Replay one sample's hier device trace with real chemistry,
    verifying every assembly decision: the device scored candidates and
    picked the best FEASIBLE one, so chemistry re-checks (a) that every
    skipped beam really had no feasible assembly, (b) the chosen
    candidate's feasibility, and (c) the device's per-candidate
    feasibility bitmasks for the chosen beam against ``try_add_mol`` —
    an oracle false-negative on a real-feasible candidate would change
    the within-beam argmax, so any bit mismatch falls back rather than
    silently diverging.  Returns ('done', smiles) or ('diverge', None) —
    hier divergences fall back to the exact path whole (divergence
    resolution would need device candidate scores the trace does not
    carry)."""
    tree = IncTree(1, max_nodes=max_nodes, max_edges=max_edges, max_nb=12,
                   max_sub_nodes=32)
    graph = IncGraph(avocab, 1, max_nodes=max_nodes,
                     max_edges=max_edges + 100)
    stack: List[int] = []
    clab, ilab = int(root_cls_b), int(root_icls_b)
    super_root = tree.add_node()
    root_idx = tree.add_node((clab, ilab))
    tree.add_edge(super_root, root_idx)
    stack.append(root_idx)
    try:
        new_atoms, new_bonds, attached = graph.add_mol(
            0, vocab.get_ismiles(ilab), [], 0)
    except Exception:
        return 'done', None
    tree.register_cgraph(root_idx, new_atoms, new_bonds, attached)

    T = trace_b.shape[0]
    K = beam
    for t in range(T):
        if not stack:
            break
        choose = trace_b[t, 1] > 0.5
        if not choose:
            child = stack.pop()
            if stack:
                top = stack[-1]
                tree.add_edge(child, top, (child, top, tree.in_degree(top)))
            continue
        parent = stack[-1]
        new_node = tree.add_node()
        tree.add_edge(parent, new_node, (parent, new_node, 0))
        stack.append(new_node)
        cls_topk = trace_b[t, 2 + K:2 + 2 * K].astype(np.int32)
        icls_topk = trace_b[t, 2 + 2 * K:2 + 3 * K].astype(np.int32)
        dev_j = int(trace_b[t, 2 + 3 * K])
        kind = int(trace_b[t, 2 + 3 * K + 2])
        slot = int(trace_b[t, 2 + 3 * K + 3])
        n_check = K if dev_j < 0 else dev_j

        def beam_has_valid(kk):
            clab_k, ilab_k = int(cls_topk[kk]), int(icls_topk[kk])
            try:
                ismiles = vocab.get_ismiles(ilab_k)
                fa_cluster, _, fa_used = tree.get_cluster(parent)
                cands, _, attach_points = graph.get_assm_cands(
                    fa_cluster, fa_used, ismiles)
                for c in cands[:24]:
                    if graph.try_add_mol(0, ismiles,
                                         list(zip(list(c), attach_points))):
                        return True
            except Exception:
                pass
            return False

        # device-skipped beams must really have no valid assembly
        for kk in range(min(n_check, K)):
            if beam_has_valid(kk):
                return 'diverge', None
        if dev_j < 0:
            _forced_backtrack(tree, [stack], 0)
            continue

        clab_j, ilab_j = int(cls_topk[dev_j]), int(icls_topk[dev_j])
        try:
            ismiles = vocab.get_ismiles(ilab_j)
            tree.set_node_feature(new_node, (clab_j, ilab_j))
            fa_cluster, _, fa_used = tree.get_cluster(parent)
            cands, _, attach_points = graph.get_assm_cands(
                fa_cluster, fa_used, ismiles)
            # verify the device's within-beam feasibility verdict for EVERY
            # enumerated candidate, not just the chosen one: the device
            # picks the best-scoring FEASIBLE candidate, so an oracle
            # false-negative on a real-feasible candidate silently changes
            # the argmax.  Each host candidate maps back to its (kind,
            # slot) code; its real feasibility must equal the packed
            # oracle bit, else fall back to the exact path.
            fmask = (int(trace_b[t, 2 + 3 * K + 4]),
                     int(trace_b[t, 2 + 3 * K + 5]),
                     int(trace_b[t, 2 + 3 * K + 6]))
            fc = list(fa_cluster)
            n_fc = len(fc)
            for c in cands[:24]:
                cl = list(c)
                if cl[0] not in fc:
                    return 'diverge', None
                s0 = fc.index(cl[0])
                if s0 >= 24:
                    return 'diverge', None
                if len(cl) == 1:
                    dev_ok = bool((fmask[0] >> s0) & 1)
                elif n_fc == 2:
                    # fwd and rev runs coincide for a 2-atom cluster; the
                    # device may code the pair under either kind
                    dev_ok = bool(((fmask[1] | fmask[2]) >> s0) & 1)
                elif cl[-1] == fc[(s0 + 1) % n_fc]:
                    dev_ok = bool((fmask[1] >> s0) & 1)
                elif cl[-1] == fc[(s0 - 1) % n_fc]:
                    dev_ok = bool((fmask[2] >> s0) & 1)
                else:
                    return 'diverge', None
                real_ok = graph.try_add_mol(
                    0, ismiles, list(zip(cl, attach_points)))
                if dev_ok != real_ok:
                    return 'diverge', None
            want = _hier_candidate(list(fa_cluster), kind, slot)
            chosen = None
            if want is not None:
                for c in cands[:24]:
                    cl = list(c)
                    if len(cl) == 1 and cl[0] == want[0]:
                        chosen = cl
                        break
                    if len(cl) >= 2 and cl[0] == want[0] and cl[-1] == want[1]:
                        chosen = cl
                        break
            if chosen is None:
                return 'diverge', None
            pairs = list(zip(chosen, attach_points))
            if not graph.try_add_mol(0, ismiles, pairs):
                return 'diverge', None
            nth_child = 0 if len(cands) == 1 else tree.in_degree(parent)
            new_atoms, new_bonds, attached = graph.add_mol(
                0, ismiles, pairs, nth_child)
            tree.register_cgraph(new_node, new_atoms, new_bonds, attached)
            tree.update_attached(parent, pairs)
        except Exception:
            return 'diverge', None
    smiles = graph.get_smiles()
    return 'done', (smiles[0] if smiles else None)


def decode_hier_turbo(model, params, vocab: PairVocab, avocab: Vocab,
                      root_vecs: np.ndarray, greedy: bool = True,
                      max_decode_step: int = 150, beam: int = 5,
                      max_nodes: int = 400, max_edges: int = 500,
                      rng: Optional[np.random.Generator] = None,
                      log_steps: bool = False,
                      ladder: Optional[tuple] = None,
                      chunk: Optional[int] = None,
                      a_budget: int = 256, eg_budget: int = 384,
                      nbg_budget: int = 8):
    """Device-resident speculative decode for the HIER family: one
    ``lax.scan`` proposes the whole trajectory (``HierDecoder.
    hdec_propose`` — 3-level message passing, candidate scoring against
    live atom hiddens, and the exact per-atom valence oracle all
    in-scan); the host replays and VERIFIES the trace with real
    chemistry.  Samples whose replay diverges, that graft untrackable
    motifs (``poisoned``), or that outrun a ladder rung re-run — rung
    re-entry recomputes from scratch (the scan is deterministic), and
    divergent/poisoned samples fall back to ``decode_hier``.

    ``ladder``/``chunk`` as in ``decode_motif_turbo``: ``None`` picks the
    per-backend ladder default ((64,) on CPU, () on TPU); ``chunk``
    decodes in pipelined chunks whose round-0 proposes are all dispatched
    before the first fetch, hiding host replay behind device time."""
    if not greedy or log_steps:
        return decode_hier(model, params, vocab, avocab, root_vecs,
                           greedy=greedy, max_decode_step=max_decode_step,
                           beam=beam, max_nodes=max_nodes,
                           max_edges=max_edges, rng=rng, log_steps=log_steps)
    _check_no_attention(model)
    root_vecs = np.asarray(root_vecs)
    batch_size = root_vecs.shape[0]
    T = max_decode_step
    tabs = _assm_tables(vocab, avocab)
    # vocab-derived static cluster-edge budget: a graft records 2 rows per
    # motif bond, so 2·max(nbond)+2 covers every trackable motif — the
    # conservative KE=64 default sized the per-step atom refresh (the
    # propose scan's dominant section, runs/PROPOSE_COST.json) ~2x too big
    ke = min(64, 2 * int(np.asarray(tabs['nbond']).max()) + 2)
    # a_budget/eg_budget/nbg_budget: static atom/edge-row/in-degree budgets
    # for the propose scan's per-sample flat tables.  The scan carries
    # (1+B·Eg)-row LSTM (h, c) states and a (1+B·A)-row atom table through
    # every step — the old conservative defaults (A=512, Eg=640) made the
    # 3-level state ~300 MB at B=120 and the scan HBM-copy-bound
    # (runs/PROPOSE_COST.json).  Tighter budgets are SAFE: an overrun
    # poisons the sample in-scan and it falls back to the exact host path.
    kern = _get_kernel(HierDecodeKernel, model, params, vocab.mask, beam,
                       ke, a_budget, eg_budget, nbg_budget)
    if ladder is None:
        ladder = (64,) if jax.default_backend() == 'cpu' else ()
    rungs = sorted({min(r, T) for r in ladder} | {T})

    smiles_out: List[Optional[str]] = [None] * batch_size
    results: List[list] = [[] for _ in range(batch_size)]
    fallback: List[int] = []
    TURBO_STATS.update(rounds=0, batch=batch_size, fallbacks=0,
                       pending_per_round=[], rungs=[])

    if chunk is None or chunk >= batch_size:
        chunk = batch_size
    chunk_pending = [list(range(i, min(i + chunk, batch_size)))
                     for i in range(0, batch_size, chunk)]
    chunks = [{'pending': p, 'ri': 0, 'size': chunk} for p in chunk_pending]

    def dispatch(ch):
        pending, ri = ch['pending'], ch['ri']
        T_r = rungs[ri]
        TURBO_STATS['rungs'].append(T_r)
        TURBO_STATS['pending_per_round'].append(len(pending))
        TURBO_STATS['rounds'] = max(TURBO_STATS['rounds'], ri + 1)
        n_p = len(pending)
        nb = 16 if (ri and n_p <= 16 and ch['size'] > 16) else ch['size']
        cols = pending + [pending[0]] * (nb - n_p)
        rv_r = jnp.asarray(root_vecs[np.asarray(cols)])
        u_r = jnp.full((T_r, nb), 0.5, dtype=jnp.float32)
        ch['out'] = kern.propose(rv_r, u_r, tabs)
        for o in ch['out']:
            if hasattr(o, 'copy_to_host_async'):
                o.copy_to_host_async()
        ch['cols'], ch['n_p'], ch['final'] = cols, n_p, T_r == T

    inflight = deque()
    for ch in chunks:
        dispatch(ch)
        inflight.append(ch)
    while inflight:
        ch = inflight.popleft()
        packed, root_cls, root_icls, poisoned = ch['out']
        ch['out'] = None
        packed = np.asarray(packed)
        root_cls = np.asarray(root_cls)
        root_icls = np.asarray(root_icls)
        poisoned = np.asarray(poisoned)

        final = ch['final']
        still = []
        for j, b in enumerate(ch['cols'][:ch['n_p']]):
            if poisoned[j]:
                fallback.append(b)
                continue
            # unfinished at a short rung? (simulate the stack depth)
            if not final:
                depth = 1
                done_early = False
                for tt in range(packed.shape[0]):
                    if depth <= 0:
                        done_early = True
                        break
                    chs = packed[tt, j, 1] > 0.5
                    jj = int(packed[tt, j, 2 + 3 * beam])
                    depth += (1 if jj >= 0 else -1) if chs else -1
                if not (done_early or depth <= 0):
                    still.append(b)
                    continue
            status, out = _replay_hier(packed[:, j, :], root_cls[j],
                                       root_icls[j], vocab, avocab, beam,
                                       max_nodes, max_edges)
            if status == 'done':
                smiles_out[b] = out
            else:
                fallback.append(b)
        if still:
            ch['pending'] = still
            ch['ri'] += 1       # rungs end with T (final=True), so a chunk
            dispatch(ch)        # with 'still' samples always has a next rung
            inflight.append(ch)

    TURBO_STATS['fallbacks'] = len(fallback)
    if fallback:
        res2, sm2 = decode_hier(model, params, vocab, avocab,
                                root_vecs[np.asarray(fallback)],
                                greedy=True, max_decode_step=max_decode_step,
                                beam=beam, max_nodes=max_nodes,
                                max_edges=max_edges, rng=rng,
                                log_steps=log_steps)
        for j, b in enumerate(fallback):
            smiles_out[b] = sm2[j]
            results[b] = res2[j]
    return results, smiles_out


def decode_best(model, params, vocab: PairVocab, avocab: Vocab,
                root_vecs: np.ndarray, greedy: bool = True,
                log_steps: bool = False, **kwargs):
    """Fastest semantics-preserving decode for the model family: the
    device-resident turbo paths for greedy decoding without per-step
    logs (per-step logs require the host-interleaved loops), the exact
    paths otherwise.  ``chunk`` (turbo paths only) pipelines large
    batches: see ``decode_motif_turbo``."""
    if type(model).__name__.startswith('Hier'):
        if greedy and not log_steps:
            return decode_hier_turbo(model, params, vocab, avocab,
                                     root_vecs, greedy=True, **kwargs)
        kwargs.pop('chunk', None)
        return decode_hier(model, params, vocab, avocab, root_vecs,
                           greedy=greedy, log_steps=log_steps, **kwargs)
    if greedy and not log_steps:
        return decode_motif_turbo(model, params, vocab, avocab, root_vecs,
                                  greedy=True, **kwargs)
    kwargs.pop('chunk', None)
    return decode_motif(model, params, vocab, avocab, root_vecs,
                        greedy=greedy, log_steps=log_steps, **kwargs)


def sample_prior(model, params, vocab: PairVocab, avocab: Vocab,
                 batch_size: int, rng: Optional[np.random.Generator] = None,
                 latent_size: Optional[int] = None, **decode_kwargs):
    """Sample molecules from the prior N(0, I) over the latent space
    (reference HierVAE.sample, hpgnn.py:35-37 / HierPropertyVAE.sample,
    property_vae.py:35-37)."""
    rng = rng or np.random.default_rng(0)
    if latent_size is None:
        latent_size = model.cfg.latent_size
    z = rng.standard_normal((batch_size, latent_size)).astype(np.float32)
    return decode_best(model, params, vocab, avocab, z, greedy=True,
                       **decode_kwargs)


def decode_motif(model, params, vocab: PairVocab, avocab: Vocab,
                 root_vecs: np.ndarray, greedy: bool = True,
                 max_decode_step: int = 150, beam: int = 5,
                 max_nodes: int = 400, max_edges: int = 500,
                 rng: Optional[np.random.Generator] = None,
                 log_steps: bool = True,
                 src_mem=None, src_scope=None):
    """Decode a batch of latent vectors into molecules.

    ``src_mem``/``src_scope`` (from the model's ``encode_attention_memory``)
    enable attention-aware decoding of ``use_attention`` models: the topo
    and cls heads attend over the encoder's node memory exactly as in
    training.  The reference's own attention decode path is unusable (its
    torch.bmm over 2-D gathered vectors throws), so this exceeds parity.

    Returns (results, smiles_list); ``results[b]`` is a list of per-step log
    dicts mirroring the reference's ``results`` structure
    (decoder.py:924-948, 993, 1035-1036, 1072)."""
    rng = rng or np.random.default_rng(0)
    _check_no_attention(model, has_src=src_mem is not None)
    root_vecs = jnp.asarray(root_vecs)
    batch_size = root_vecs.shape[0]
    results = [[] for _ in range(batch_size)]

    src_mask = None
    if src_mem is not None:
        from .decoder import scope_mask
        src_mem = jnp.asarray(src_mem)
        src_mask = scope_mask(jnp.asarray(src_scope), src_mem.shape[0])

    tree = IncTree(batch_size, max_nodes=max_nodes, max_edges=max_edges)
    graph = IncGraph(avocab, batch_size, max_nodes=max_nodes,
                     max_edges=max_edges + 100)
    stack: List[List[int]] = [[] for _ in range(batch_size)]

    # --- root prediction (reference decoder.py:914-948) -------------------
    kern = _get_kernel(MotifDecodeKernel, model, params, vocab.mask, beam)
    cls_scores, icls_scores = kern.root_cls(root_vecs, src_mem, src_mask)
    root_cls = np.asarray(jnp.argmax(cls_scores, axis=-1))
    icls_masked = np.asarray(icls_scores) + vocab.get_mask(root_cls)
    root_icls = icls_masked.argmax(axis=-1)

    for b in range(batch_size):
        r = {'root': vocab.get_smiles(int(root_cls[b]))}
        order = np.argsort(-icls_masked[b])[:5]
        r['top-5-root-attachments'] = [
            (vocab.get_ismiles(int(c)), float(icls_masked[b, c])) for c in order]
        r['Attaching Fragment'] = {'mol': int(root_cls[b]),
                                   'attachment': vocab.get_ismiles(int(root_icls[b]))}
        results[b].append(r)

    super_root = tree.add_node()
    for b in range(batch_size):
        clab, ilab = int(root_cls[b]), int(root_icls[b])
        root_idx = tree.add_node((clab, ilab))
        tree.add_edge(super_root, root_idx)
        stack[b].append(root_idx)
        root_smiles = vocab.get_ismiles(ilab)
        new_atoms, new_bonds, attached = graph.add_mol(b, root_smiles, [], 0)
        tree.register_cgraph(root_idx, new_atoms, new_bonds, attached)

    n_rows = max_edges * batch_size
    state = kern.init_state(n_rows, root_vecs)
    max_nb = tree.max_nb

    u_greedy = np.full(batch_size, 0.5, dtype=np.float32)

    for t in range(max_decode_step):
        for r in results:
            r.append({})
        batch_list = [b for b in range(batch_size) if stack[b]]
        if not batch_list:
            break

        # ---- speculative step inputs: both branches precomputed ---------
        # (single fused device call per step; see dec_step_fused docstring)
        v_clab = np.zeros(batch_size, dtype=np.int32)
        agraph_rows = np.zeros((batch_size, max_nb), dtype=np.int32)
        can_exp = np.zeros(batch_size, dtype=bool)
        new_rows = np.zeros(batch_size, dtype=np.int32)
        bt_valid = np.zeros(batch_size, dtype=bool)
        bt_pos = np.zeros(batch_size, dtype=np.int32)
        bt_bg = np.zeros((batch_size, max_nb), dtype=np.int32)
        first = tree.reserve_edges(len(batch_list))
        reserved = {}
        for r_i, b in enumerate(batch_list):
            v = stack[b][-1]
            row = first + r_i
            reserved[b] = row
            new_rows[b] = row
            v_clab[b] = tree.fnode[v, 0]
            agraph_rows[b] = tree.agraph[v]
            can_exp[b] = tree.can_expand(v)
            if len(stack[b]) >= 2:
                top = stack[b][-2]
                bt_valid[b] = True
                bt_pos[b] = min(tree.in_degree(top), 19)
                rev = tree.edge_dict.get((top, v), 0)
                bg = tree.agraph[v].copy()
                bg[bg == rev] = 0
                bt_bg[b] = bg
        u = u_greedy if greedy else rng.random(batch_size).astype(np.float32)

        state, packed = kern.step_fused(
            state, jnp.asarray(v_clab), jnp.asarray(agraph_rows),
            jnp.asarray(can_exp), jnp.asarray(u), jnp.asarray(new_rows),
            jnp.asarray(v_clab), jnp.asarray(agraph_rows),
            jnp.asarray(bt_valid), jnp.asarray(v_clab),
            jnp.asarray(bt_pos), jnp.asarray(bt_bg), root_vecs,
            src_mem=src_mem, src_mask=src_mask)
        # ONE host sync / tunnel round-trip per step
        packed = np.asarray(packed)
        topo_p = 1.0 / (1.0 + np.exp(-packed[:, 0]))
        choose = packed[:, 1] > 0.5
        scores = packed[:, 2:2 + beam]
        cls_topk = packed[:, 2 + beam:2 + 2 * beam].astype(np.int32)
        icls_topk = packed[:, 2 + 2 * beam:2 + 3 * beam].astype(np.int32)

        # ---- replay the device's branch choice on the host tree ---------
        expand_bids = []
        for b in batch_list:
            results[b][-1]['Generate fragment'] = float(topo_p[b])
            row = reserved[b]
            if choose[b]:
                parent = stack[b][-1]
                new_node = tree.add_node()
                tree.add_edge(parent, new_node, (parent, new_node, 0), row=row)
                stack[b].append(new_node)
                expand_bids.append(b)
            else:
                child = stack[b].pop()
                if stack[b]:
                    top = stack[b][-1]
                    nth_child = tree.in_degree(top)
                    tree.add_edge(child, top, (child, top, nth_child), row=row)

        for b in expand_bids:
            new_node, fa_node = stack[b][-1], stack[b][-2]
            cls_beam = _pick_beam(greedy, beam, scores[b], rng)
            if log_steps:
                results[b][-1]['top-5-inter-cands'] = [
                    (vocab.get_smiles(int(x)), vocab.get_ismiles(int(y)), float(s))
                    for x, y, s in zip(cls_topk[b], icls_topk[b], scores[b])]
            # candidate scores are identical for the motif decoder → the
            # reference's stable sort keeps enumeration order (score_cands=None)
            ok = _try_assemble(tree, graph, vocab, b, new_node, fa_node,
                               cls_beam, cls_topk[b], icls_topk[b], None,
                               results[b][-1] if log_steps else None)
            if not ok:  # forced backtrack (reference decoder.py:1079-1089)
                _forced_backtrack(tree, stack, b)

    smiles_out = graph.get_smiles()
    while len(smiles_out) < batch_size:
        smiles_out.append(None)
    return results, smiles_out
