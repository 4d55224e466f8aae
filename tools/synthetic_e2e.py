"""Synthetic end-to-end quality gate: train the matcher, benchmark pose AUC.

Exercises the learned-matching -> differentiable-pose loop on exact synthetic
geometry. Keypoints are PLANTED: shared world points on a textured multi-plane
scene are projected into both views (sub-pixel exact, plus detection noise),
and each world point carries an oracle descriptor (a random unit vector seen
by both views with independent noise) -- isolating what the gate measures (the
matcher learning appearance -> correspondence -> pose composition) from
detector/descriptor quality, which requires pretrained weights and large-scale
training no synthetic smoke fixture can supply. Filler slots get random
positions and unrelated descriptors, mirroring `fill_with_random_keypoints`.

The gate: after stage-1 training on the match NLL, the two-view benchmark path
(matcher -> confidence-weighted eight-point) must lift pose AUC far above the
untrained model.

Usage: python tools/synthetic_e2e.py [--steps 600] [--cpu] [--out result.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2500)
    parser.add_argument("--stage2_steps", type=int, default=0,
                        help="pose-loss fine-tuning steps after stage 1 "
                             "(conf-MLP grafted in, reference two-stage recipe)")
    parser.add_argument("--mv_tuples", type=int, default=8,
                        help="5-view tuples for the multi-view pipeline "
                             "benchmark (0 disables)")
    parser.add_argument("--mv_train_steps", type=int, default=0,
                        help="train a V=5 multi-frame matcher from scratch for "
                             "N steps and gate the learned-match multi-view "
                             "pipeline (the flagship capability; reference "
                             "trains per tuple size, train.py:262-268)")
    parser.add_argument("--conf_steps1", type=int, default=0,
                        help="conf-MLP gate: stage-1 (match NLL) steps on the "
                             "deceptive-outlier fixture (0 disables the phase)")
    parser.add_argument("--conf_steps2", type=int, default=800,
                        help="conf-MLP gate: stage-2 (blended pose loss) steps")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--save_mv", type=str, default=None,
                        help="pickle the V=5-trained matcher params + eval "
                             "fixture here (requires --mv_train_steps > 0)")
    args = parser.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from e2e_multi_view_matching_tpu.data.synthetic import SphereFieldScene
    from e2e_multi_view_matching_tpu.geom.metrics import pose_auc, pose_error_max
    from e2e_multi_view_matching_tpu.mvba.pipeline import robust_relative_poses
    from e2e_multi_view_matching_tpu.models.matcher import (
        MatcherConfig, MultiViewMatcher, default_gnn_layers,
    )
    from e2e_multi_view_matching_tpu.train.losses import match_loss_of_pair
    from e2e_multi_view_matching_tpu.train.optim import build_optimizer

    rng = np.random.default_rng(0)
    V, K, H, W, F = 2, 96, 192, 256, 260.0
    N_VISIBLE = 64  # planted correspondences per pair; rest are distractors
    N_EVAL = 24
    NOISE_PX = 0.4
    DESC_NOISE = 0.25
    D = 256
    key = jax.random.PRNGKey(0)

    def build_case(scene, rng):
        """One two-view sample with planted correspondences."""
        pix0, pix1 = scene.correspondences(0, 1, N_VISIBLE, rng, margin=12)
        n_vis = len(pix0)
        kpts = np.zeros((V, K, 2), np.float32)
        gt = np.full((2, K + 1), -1, np.int64)
        # shuffle slot order in view 1 so identity matching is never correct
        perm = rng.permutation(K)
        kpts[0, :n_vis] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
        for s in range(n_vis):
            kpts[1, perm[s]] = pix1[s] + rng.normal(size=2) * NOISE_PX
            gt[0, s] = perm[s]
            gt[1, perm[s]] = s
        fill = rng.uniform([10, 10], [W - 10, H - 10], size=(K, 2)).astype(np.float32)
        kpts[0, n_vis:] = fill[n_vis:]
        unused = np.setdiff1d(np.arange(K), perm[:n_vis])
        kpts[1, unused] = fill[: len(unused)]
        kpts[:, :, 0] = np.clip(kpts[:, :, 0], 0, W - 1)
        kpts[:, :, 1] = np.clip(kpts[:, :, 1], 0, H - 1)
        weights = np.zeros((2, K + 1), np.float32)
        matched_frac = max(n_vis / K, 1e-3)
        w_match = 0.5 / matched_frac
        w_un = 0.5 / (1 - matched_frac)
        weights[0] = np.where(gt[0] >= 0, w_match, w_un)
        weights[1] = np.where(gt[1] >= 0, w_match, w_un)
        # oracle descriptors: shared identity per world point + per-view noise
        base = rng.normal(size=(K, D)).astype(np.float32)
        d0 = base + rng.normal(size=(K, D)).astype(np.float32) * DESC_NOISE
        d1 = np.empty_like(d0)
        d1[perm] = base + rng.normal(size=(K, D)).astype(np.float32) * DESC_NOISE
        # distractor slots get fresh unrelated descriptors in BOTH views (no
        # accidental cross-view descriptor twins at unrelated positions)
        d0[n_vis:] = rng.normal(size=(K - n_vis, D)).astype(np.float32)
        d1[unused] = rng.normal(size=(len(unused), D)).astype(np.float32)
        descs = np.stack([d0, d1])
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        scores = np.full((V, K), 0.5, np.float32)
        T_gt = scene.relative_pose(0, 1)
        poses = np.stack([scene.poses[0], scene.poses[1]]).astype(np.float32)
        return (descs, kpts, scores, gt, weights, T_gt,
                scene.intr[0].astype(np.float32), poses)

    def build_set(n):
        cases = [build_case(SphereFieldScene(
            rng, n_views=V, H=H, W=W, f=F, baseline=0.9, rot_jitter=0.1), rng)
            for _ in range(n)]
        stack = lambda i: jnp.asarray(np.stack([c[i] for c in cases]))
        return tuple(stack(i) for i in range(8))

    (ev_descs, ev_kpts, ev_scores, ev_gt, ev_w, ev_T, ev_intr,
     ev_poses) = build_set(N_EVAL)

    # match_threshold=0: the reference's w8pt eval modes do not threshold --
    # they rely on confidence weighting in the pose solve (`eval_pairs.py:152`)
    matcher = MultiViewMatcher(MatcherConfig(
        gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30, conf_mlp=False,
        match_threshold=0.0,
    ))
    m_vars = matcher.init(key, ev_kpts[:1], ev_scores[:1], ev_descs[:1],
                          jnp.full((1, V, 2), float(H)))
    params, bstats = m_vars["params"], m_vars["batch_stats"]
    tx = build_optimizer(3e-4, 1.0, 0, 0, pose_loss=False)
    opt_state = tx.init(params)
    MB = 8
    mb_size = jnp.full((MB, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)

    @jax.jit
    def train_step(params, bstats, opt_state, bk, bs_, bd, bgi, bgw):
        def loss_fn(p):
            out, upd = matcher.apply(
                {"params": p, "batch_stats": bstats}, bk, bs_, bd, mb_size,
                train=True, full_output=False, mutable=["batch_stats"],
            )
            return match_loss_of_pair(out["log_assignment"][:, 0], bgi, bgw), \
                upd["batch_stats"]

        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, l

    e_size = jnp.full((N_EVAL, V, 2), 0.0).at[..., 0].set(H).at[..., 1].set(W)

    def benchmark(params, bstats):
        out = matcher.apply({"params": params, "batch_stats": bstats},
                            ev_kpts, ev_scores, ev_descs, e_size)
        m0 = out["matches0"][:, 0]
        conf = jnp.where(m0 >= 0, out["matching_scores0"][:, 0], 0.0)
        gather = jnp.clip(m0, 0, K - 1)
        k1 = jnp.take_along_axis(ev_kpts[:, 1], gather[..., None], axis=1)
        # robust IRLS w8pt+BA (the production relative-pose path): on identical
        # matches this lifts AUC@20 from ~15% (plain weighted solve) to ~70%
        T_pred, _, valid_r, _ = robust_relative_poses(
            ev_kpts[:, 0], k1, ev_intr, ev_intr, conf, 10,
        )
        errs = np.asarray(pose_error_max(ev_T, T_pred, degrees=True))
        errs = np.where(np.asarray(valid_r), errs, np.inf)
        gt0 = np.asarray(ev_gt[:, 0, :-1])
        m0n = np.asarray(m0)
        both = (gt0 >= 0) & (m0n >= 0)
        precision = float((m0n == gt0)[both].mean()) if both.any() else 0.0
        return pose_auc(errs, [5, 10, 20]), precision, float((m0n >= 0).mean())

    auc_b, prec_b, frac_b = benchmark(params, bstats)
    print(f"before: AUC@5/10/20={[round(a*100,1) for a in auc_b]} "
          f"precision={prec_b:.2f} matched={frac_b:.2f}", flush=True)
    t0 = time.time()
    for step in range(args.steps):
        # FRESH scenes every step: the matcher must learn the matching rule,
        # not memorize a fixed training set
        b = build_set(MB)
        params, bstats, opt_state, l = train_step(
            params, bstats, opt_state, b[1], b[2], b[0], b[3], b[4]
        )
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(l):.2f}", flush=True)
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s", flush=True)
    auc_a, prec_a, frac_a = benchmark(params, bstats)
    print(f"after:  AUC@5/10/20={[round(a*100,1) for a in auc_a]} "
          f"precision={prec_a:.2f} matched={frac_a:.2f}", flush=True)

    result = {"auc_before": auc_b, "auc_after": auc_a,
              "precision_before": prec_b, "precision_after": prec_a,
              "steps": args.steps}

    if args.mv_tuples > 0:
        # ---- multi-view pipeline benchmark (5-view tuples) -----------------
        # the full production eval path on learned matches: multi-frame matcher
        # (stage-1 weights -- the layer stack is V-agnostic) -> per-pair robust
        # relative poses -> spanning tree -> rotation/translation averaging ->
        # multi-camera Schur BA -> pairwise pose AUC, mirroring
        # `eval_multi_view.py:21-87`.
        from e2e_multi_view_matching_tpu.mvba.pipeline import (
            multi_view_pose_pipeline_batch,
        )

        V_MV = 5
        matcher_mv = MultiViewMatcher(MatcherConfig(
            gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30,
            conf_mlp=False, match_threshold=0.0, multi_frame_matching=True,
        ))

        def build_mv_case(scene, rng, with_gt=False):
            margin = 12
            # sample world points from EVERY view's frustum: seeding only from
            # view 0 starves non-adjacent pairs of co-visible points (<8 =>
            # w8pt invalid, graph edges drop, the spanning tree runs through
            # garbage) -- oracle-match AUC@20 was 35% seeded from view 0 vs
            # 91% with union sampling
            Xw = np.concatenate([
                scene.unproject(v, rng.uniform(
                    [margin, margin], [W - margin, H - margin],
                    size=(N_VISIBLE, 2)))
                for v in range(V_MV)
            ])
            pix = np.zeros((V_MV, len(Xw), 2), np.float32)
            vis = np.zeros((V_MV, len(Xw)), bool)
            for v in range(V_MV):
                p, d = scene.project(v, Xw)
                dsurf = scene.depth_at(v, p)
                ok = ((d > 0.1)
                      & (np.abs(dsurf - d) < 0.05 * np.maximum(d, 1e-6))
                      & (p[:, 0] > margin) & (p[:, 0] < W - margin)
                      & (p[:, 1] > margin) & (p[:, 1] < H - margin))
                pix[v], vis[v] = p.astype(np.float32), ok
            # world points co-visible in >= 2 views get planted; each view sees
            # its own visible subset, occluded slots become distractors
            keep = rng.permutation(np.where(vis.sum(0) >= 2)[0])[:N_VISIBLE]
            n_vis = len(keep)
            pix, vis = pix[:, keep], vis[:, keep]
            base = rng.normal(size=(n_vis, D)).astype(np.float32)
            kpts = np.zeros((V_MV, K, 2), np.float32)
            descs = np.zeros((V_MV, K, D), np.float32)
            slot_of = np.zeros((V_MV, n_vis), np.int64)
            for v in range(V_MV):
                perm = rng.permutation(K)
                slots = perm[:n_vis]
                slot_of[v] = slots
                fill_p = rng.uniform([10, 10], [W - 10, H - 10],
                                     size=(n_vis, 2)).astype(np.float32)
                kpts[v, slots] = np.where(
                    vis[v][:, None],
                    pix[v] + rng.normal(size=(n_vis, 2)) * NOISE_PX, fill_p)
                descs[v, slots] = np.where(
                    vis[v][:, None],
                    base + rng.normal(size=(n_vis, D)).astype(np.float32)
                    * DESC_NOISE,
                    rng.normal(size=(n_vis, D)).astype(np.float32))
                rest = perm[n_vis:]
                kpts[v, rest] = rng.uniform([10, 10], [W - 10, H - 10],
                                            size=(len(rest), 2))
                descs[v, rest] = rng.normal(size=(len(rest), D))
            descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
            kpts[..., 0] = np.clip(kpts[..., 0], 0, W - 1)
            kpts[..., 1] = np.clip(kpts[..., 1], 0, H - 1)
            # oracle matches: co-visible world points, exact slot mapping
            P_MV = V_MV * (V_MV - 1) // 2
            m0_oracle = np.full((P_MV, K), -1, np.int64)
            conf_oracle = np.zeros((P_MV, K), np.float32)
            for pi, (i, j) in enumerate(
                    (i, j) for j in range(V_MV) for i in range(j)):
                for s in np.where(vis[i] & vis[j])[0]:
                    m0_oracle[pi, slot_of[i, s]] = slot_of[j, s]
                    conf_oracle[pi, slot_of[i, s]] = 1.0
            T_gt = np.stack([scene.relative_pose(i, j)
                             for j in range(V_MV) for i in range(j)])
            if not with_gt:
                return (kpts, descs, T_gt, scene.intr[0].astype(np.float32),
                        m0_oracle, conf_oracle)
            # per-pair GT supervision for the match NLL: indices (P, 2, K+1)
            # with -1 = dustbin, class-balanced weights (`helpers.py:205-213`)
            gt = np.full((P_MV, 2, K + 1), -1, np.int64)
            w = np.zeros((P_MV, 2, K + 1), np.float32)
            for pi in range(P_MV):
                gt[pi, 0, :K] = m0_oracle[pi]
                for k in range(K):
                    if m0_oracle[pi, k] >= 0:
                        gt[pi, 1, m0_oracle[pi, k]] = k
                for r in range(2):
                    mfrac = max(float((gt[pi, r, :K] >= 0).mean()), 1e-3)
                    w[pi, r] = np.where(gt[pi, r] >= 0, 0.5 / mfrac,
                                        0.5 / max(1.0 - mfrac, 1e-3))
            return (kpts, descs, T_gt, scene.intr[0].astype(np.float32),
                    m0_oracle, conf_oracle, gt, w)

        # tighter camera spread than the two-view cases: 5-tuples mirror the
        # reference's overlap-sampled tuples (0.4-0.8 pairwise overlap), not
        # wide stereo baselines
        mv_cases = [build_mv_case(SphereFieldScene(
            rng, n_views=V_MV, H=H, W=W, f=F, baseline=0.35, rot_jitter=0.04),
            rng) for _ in range(args.mv_tuples)]
        B_MV = args.mv_tuples
        mv_kpts = jnp.asarray(np.stack([c[0] for c in mv_cases]))
        mv_descs = jnp.asarray(np.stack([c[1] for c in mv_cases]))
        mv_T = np.stack([c[2] for c in mv_cases])  # (B, P, 4, 4)
        mv_intr = np.stack([np.tile(c[3], (V_MV, 1, 1)) for c in mv_cases])
        mv_scores = jnp.full((B_MV, V_MV, K), 0.5)
        mv_size = jnp.full((B_MV, V_MV, 2), 0.0
                           ).at[..., 0].set(H).at[..., 1].set(W)
        mv_pairs = [(i, j) for j in range(V_MV) for i in range(j)]

        def mv_benchmark(m0, conf):
            extr = multi_view_pose_pipeline_batch(mv_kpts, mv_intr, m0, conf)
            T_pred = np.stack([
                [extr[b, j] @ np.linalg.inv(extr[b, i]) for (i, j) in mv_pairs]
                for b in range(B_MV)])
            errs = np.asarray(pose_error_max(
                jnp.asarray(mv_T.reshape(-1, 4, 4).astype(np.float32)),
                jnp.asarray(T_pred.reshape(-1, 4, 4).astype(np.float32)),
                degrees=True))
            return pose_auc(errs, [5, 10, 20])

        # (a) oracle matches: upper bound of the pose pipeline itself
        # (w8pt+IRLS -> tree -> averaging -> Schur BA) on exact matches
        mv_auc_oracle = mv_benchmark(
            jnp.asarray(np.stack([c[4] for c in mv_cases])),
            jnp.asarray(np.stack([c[5] for c in mv_cases])))
        print(f"multi-view oracle: AUC@5/10/20="
              f"{[round(a*100,1) for a in mv_auc_oracle]}", flush=True)
        # (b) learned matches from the stage-1 matcher run multi-frame: a
        # TRANSFER measurement -- the reference trains per-tuple-size models
        # (`train.py:262-268`), so a V=2-trained matcher under joint V=5
        # cross-attention is informative but not gated tightly
        out = matcher_mv.apply({"params": params, "batch_stats": bstats},
                               mv_kpts, mv_scores, mv_descs, mv_size)
        m0 = out["matches0"]  # (B, P, K)
        conf_mv = jnp.where(m0 >= 0, out["matching_scores0"], 0.0)
        mv_auc = mv_benchmark(m0, conf_mv)
        print(f"multi-view matcher: AUC@5/10/20="
              f"{[round(a*100,1) for a in mv_auc]} "
              f"({B_MV} 5-tuples, V=2-trained matcher)", flush=True)
        result.update({"auc_multi_view_oracle": mv_auc_oracle,
                       "auc_multi_view": mv_auc, "mv_tuples": B_MV})

        if args.mv_train_steps > 0:
            # ---- V=5-trained multi-frame model (flagship capability) -------
            # trains the SAME architecture the transfer measurement uses, but
            # at tuple_size 5 with joint cross-attention over all views --
            # the reference's per-tuple-size training design. Benchmarked
            # through the full multi-view pose pipeline mid-run and at the
            # end: the learned model must decisively beat the V=2 transfer
            # AND must not degrade as training converges (round-1 failure
            # mode: 67% near-init -> 18% converged for the transfer model).
            P_MV = V_MV * (V_MV - 1) // 2
            MB_MV = 4
            m5_vars = matcher_mv.init(
                key, mv_kpts[:1], mv_scores[:1], mv_descs[:1], mv_size[:1])
            params5, bstats5 = m5_vars["params"], m5_vars["batch_stats"]
            tx5 = build_optimizer(3e-4, 1.0, 0, 0, pose_loss=False)
            opt_state5 = tx5.init(params5)
            mv_tr_size = jnp.full((MB_MV, V_MV, 2), 0.0
                                  ).at[..., 0].set(H).at[..., 1].set(W)
            mv_tr_scores = jnp.full((MB_MV, V_MV, K), 0.5)

            @jax.jit
            def train_step5(params, bstats, opt_state, bk, bd, bgi, bgw):
                def loss_fn(p):
                    out, upd = matcher_mv.apply(
                        {"params": p, "batch_stats": bstats}, bk, mv_tr_scores,
                        bd, mv_tr_size, train=True, full_output=False,
                        mutable=["batch_stats"],
                    )
                    lp = out["log_assignment"]  # (MB, P, K+1, K+1)
                    loss = 0.0
                    for pq in range(P_MV):
                        loss = loss + match_loss_of_pair(
                            lp[:, pq], bgi[:, pq], bgw[:, pq])
                    return loss / P_MV, upd["batch_stats"]

                (l, new_bs), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx5.update(g, opt_state, params)
                return (optax.apply_updates(params, updates), new_bs,
                        opt_state, l)

            def build_mv_train_batch():
                cases = [build_mv_case(SphereFieldScene(
                    rng, n_views=V_MV, H=H, W=W, f=F, baseline=0.35,
                    rot_jitter=0.04), rng, with_gt=True)
                    for _ in range(MB_MV)]
                return (jnp.asarray(np.stack([c[0] for c in cases])),
                        jnp.asarray(np.stack([c[1] for c in cases])),
                        jnp.asarray(np.stack([c[6] for c in cases])),
                        jnp.asarray(np.stack([c[7] for c in cases])))

            mv_oracle_m0 = np.stack([c[4] for c in mv_cases])

            def mv_learned_auc(params, bstats):
                out = matcher_mv.apply({"params": params, "batch_stats": bstats},
                                       mv_kpts, mv_scores, mv_descs, mv_size)
                m0l = out["matches0"]
                confl = jnp.where(m0l >= 0, out["matching_scores0"], 0.0)
                auc = mv_benchmark(m0l, confl)
                m0n = np.asarray(m0l)
                both = (mv_oracle_m0 >= 0) & (m0n >= 0)
                prec = float((m0n == mv_oracle_m0)[both].mean()) if both.any() else 0.0
                return auc, prec

            t0 = time.time()
            mid_step = max(1, args.mv_train_steps // 4)
            mv_auc_mid = None
            for step in range(args.mv_train_steps):
                bk, bd, bgi, bgw = build_mv_train_batch()
                params5, bstats5, opt_state5, l = train_step5(
                    params5, bstats5, opt_state5, bk, bd, bgi, bgw)
                if step % 50 == 0 or step == args.mv_train_steps - 1:
                    print(f"mv step {step}: loss {float(l):.2f}", flush=True)
                if step + 1 == mid_step:
                    mv_auc_mid, prec_mid = mv_learned_auc(params5, bstats5)
                    print(f"mv mid ({mid_step} steps): AUC@5/10/20="
                          f"{[round(a*100,1) for a in mv_auc_mid]} "
                          f"precision={prec_mid:.2f}", flush=True)
            print(f"mv training: {args.mv_train_steps} steps in "
                  f"{time.time()-t0:.1f}s", flush=True)
            mv_auc_tr, prec_tr = mv_learned_auc(params5, bstats5)
            print(f"multi-view V=5-trained: AUC@5/10/20="
                  f"{[round(a*100,1) for a in mv_auc_tr]} "
                  f"precision={prec_tr:.2f}", flush=True)
            result.update({
                "auc_multi_view_trained": mv_auc_tr,
                "auc_multi_view_trained_mid": mv_auc_mid,
                "precision_multi_view_trained": prec_tr,
                "mv_train_steps": args.mv_train_steps,
            })
            if args.save_mv:
                # persist the trained V=5 model + eval fixture so other
                # probes (e.g. tools/bf16_mv_gate.py, the dtype-parity gate)
                # can re-benchmark the SAME trained weights under different
                # compute dtypes / kernel impls without retraining
                import pickle

                with open(args.save_mv, "wb") as f:
                    pickle.dump({
                        "params": jax.device_get(params5),
                        "batch_stats": jax.device_get(bstats5),
                        "mv_kpts": np.asarray(mv_kpts),
                        "mv_descs": np.asarray(mv_descs),
                        "mv_T": mv_T, "mv_intr": mv_intr,
                        "mv_oracle_m0": mv_oracle_m0,
                        "auc_f32_at_save": mv_auc_tr,
                        "K": K, "H": H, "W": W, "V": V_MV, "D": D,
                    }, f)
                print(f"saved trained mv model + fixture -> {args.save_mv}",
                      flush=True)

    if args.stage2_steps > 0:
        # ---- stage 2: conf-MLP graft + pose-loss fine-tuning ---------------
        # mirrors the reference two-stage recipe (`train.py:150-260`): a fresh
        # conf-MLP model is initialized, stage-1 weights are grafted in
        # (strict=False load), and training continues on the blended
        # (1-ratio)*match + ratio*pose loss; the benchmark then uses the
        # conf-MLP scores as pose-solve weights (the production eval path).
        from e2e_multi_view_matching_tpu.train.checkpoint import _graft
        from e2e_multi_view_matching_tpu.train.losses import (
            combine_losses,
            matcher_losses,
        )

        matcher2 = MultiViewMatcher(MatcherConfig(
            gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30,
            conf_mlp=True, match_threshold=0.0,
        ))
        m2 = matcher2.init(key, ev_kpts[:1], ev_scores[:1], ev_descs[:1],
                           jnp.full((1, V, 2), float(H)))
        params2, missing, _ = _graft(m2["params"], params)
        bstats2, _, _ = _graft(m2["batch_stats"], bstats)
        print(f"stage 2: grafted stage-1 weights ({len(missing)} fresh leaves)",
              flush=True)
        # scannet 2-tuple pose weights (`train.py:218-254`); conf_mlp group
        # trains at its fixed 1e-4, main group fine-tunes slowly
        ROT_W, TRANS_W = 1597.0, 270.0
        tx2 = build_optimizer(1e-5, 1.0, 0, 0, pose_loss=True)
        opt_state2 = tx2.init(params2)
        ev_intr2 = jnp.tile(ev_intr[:, None], (1, V, 1, 1))

        @jax.jit
        def train_step2(params, bstats, opt_state, ratio, bk, bs_, bd, bgi,
                        bgw, bintr, bposes):
            def loss_fn(p):
                out, upd = matcher2.apply(
                    {"params": p, "batch_stats": bstats}, bk, bs_, bd, mb_size,
                    train=True, full_output=True, mutable=["batch_stats"],
                )
                losses = matcher_losses(out, bgi[:, None], bgw[:, None], bk,
                                        bintr, bposes, pose_loss=True)
                total, scaled = combine_losses(losses, 1, ratio, ROT_W, TRANS_W)
                return total, (upd["batch_stats"], scaled)

            (l, (new_bs, scaled)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx2.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, opt_state, l,
                    scaled)

        def benchmark2(params, bstats):
            out = matcher2.apply({"params": params, "batch_stats": bstats},
                                 ev_kpts, ev_scores, ev_descs, e_size)
            m0 = out["matches0"][:, 0]
            conf = jnp.where(m0 >= 0, out["conf_scores"][:, 0], 0.0)
            gather = jnp.clip(m0, 0, K - 1)
            k1 = jnp.take_along_axis(ev_kpts[:, 1], gather[..., None], axis=1)
            T_pred, _, valid_r, _ = robust_relative_poses(
                ev_kpts[:, 0], k1, ev_intr, ev_intr, conf, 10,
            )
            errs = np.asarray(pose_error_max(ev_T, T_pred, degrees=True))
            errs = np.where(np.asarray(valid_r), errs, np.inf)
            gt0 = np.asarray(ev_gt[:, 0, :-1])
            m0n = np.asarray(m0)
            both = (gt0 >= 0) & (m0n >= 0)
            precision = float((m0n == gt0)[both].mean()) if both.any() else 0.0
            return pose_auc(errs, [5, 10, 20]), precision

        t0 = time.time()
        for step in range(args.stage2_steps):
            b = build_set(MB)
            # ratio ramps to 0.8 over the run (fast version of the reference's
            # 2.5e-5/step ramp toward final_pose_match_ratio)
            ratio = 0.8 * min(1.0, step / max(1, args.stage2_steps // 2))
            bintr = jnp.tile(b[6][:, None], (1, V, 1, 1))
            params2, bstats2, opt_state2, l, scaled = train_step2(
                params2, bstats2, opt_state2, ratio, b[1], b[2], b[0], b[3],
                b[4], bintr, b[7],
            )
            if step % 50 == 0 or step == args.stage2_steps - 1:
                print(f"stage2 step {step}: total {float(l):.2f} "
                      f"rot {float(scaled['rot_loss']):.4f} "
                      f"transl {float(scaled['transl_loss']):.4f}", flush=True)
        print(f"stage 2: {args.stage2_steps} steps in {time.time()-t0:.1f}s",
              flush=True)
        auc_2, prec_2 = benchmark2(params2, bstats2)
        print(f"stage2: AUC@5/10/20={[round(a*100,1) for a in auc_2]} "
              f"precision={prec_2:.2f} (conf-MLP weighted)", flush=True)
        result.update({"auc_stage2": auc_2, "precision_stage2": prec_2,
                       "stage2_steps": args.stage2_steps})

    if args.conf_steps1 > 0:
        # ---- conf-MLP gate: the head must WIN on deceptive outliers ---------
        # Fixture where Sinkhorn matching scores are provably insufficient as
        # pose weights (design validated in tools/conf_gate_debug.py; passing
        # run in tools/conf_gate_result.json): besides true correspondences,
        # each case plants N_OUT "decoy twins" -- descriptor pairs nearly
        # identical across views (so the matcher confidently matches them)
        # whose positions follow several DECOY POSES (wrong relative
        # transforms, <8 points each, so no rival null space forms in the
        # w8pt Gram). Decoy-consistent positions survive matching (~0.95
        # matched) yet poison the score-weighted solve. The twins carry a
        # MEAN-OFFSET marker in the last 32 descriptor dims -- linearly
        # readable by the conf head (a variance marker is quadratic: linear
        # probes read it at chance, tools/conf_feature_probe.py) while
        # keeping twins mutually similar. Match-loss weights for twin slots
        # are 0 (the reference's dropped "uncertain" labels, helpers.py:173-192),
        # so the ONLY gradient signal about them is the pose loss through the
        # weighted eight-point solve: exactly the mechanism the reference's
        # confidence head exists for (docs/index.html:173, +6.7% claim).
        from e2e_multi_view_matching_tpu.train.checkpoint import _graft
        from e2e_multi_view_matching_tpu.train.losses import (
            combine_losses as _combine,
            matcher_losses as _mlosses,
        )
        from e2e_multi_view_matching_tpu.geom.eightpoint import (
            estimate_relative_pose_w8pt,
        )

        N_TRUE, N_OUT, N_DECOY = 48, 12, 3
        MARKER = 32  # marker dims at the tail of the descriptor

        def build_case_outliers(scene, rng):
            pix0, pix1 = scene.correspondences(0, 1, N_TRUE, rng, margin=12)
            # decoy twins: correspondences of N_DECOY wrong relative poses
            dp0s, dp1s = [], []
            per = -(-N_OUT // N_DECOY)
            for _ in range(N_DECOY):
                decoy = SphereFieldScene(rng, n_views=2, H=H, W=W, f=F,
                                         baseline=0.9, rot_jitter=0.1)
                d0, d1 = decoy.correspondences(0, 1, per, rng, margin=12)
                dp0s.append(d0)
                dp1s.append(d1)
            dp0 = np.concatenate(dp0s)[:N_OUT]
            dp1 = np.concatenate(dp1s)[:N_OUT]
            n_vis, n_out = len(pix0), len(dp0)
            kpts = np.zeros((V, K, 2), np.float32)
            descs = np.zeros((V, K, D), np.float32)
            gt = np.full((2, K + 1), -1, np.int64)
            out_mask0 = np.zeros(K, bool)
            perm0 = rng.permutation(K)
            perm1 = rng.permutation(K)
            s_true0, s_true1 = perm0[:n_vis], perm1[:n_vis]
            s_out0 = perm0[n_vis:n_vis + n_out]
            s_out1 = perm1[n_vis:n_vis + n_out]
            rest0, rest1 = perm0[n_vis + n_out:], perm1[n_vis + n_out:]
            # true correspondences: noisy positions + noisy descriptors
            kpts[0, s_true0] = pix0 + rng.normal(size=pix0.shape) * NOISE_PX
            kpts[1, s_true1] = pix1 + rng.normal(size=pix1.shape) * NOISE_PX
            base = rng.normal(size=(n_vis, D)).astype(np.float32)
            descs[0, s_true0] = base + rng.normal(size=(n_vis, D)) * 0.2
            descs[1, s_true1] = base + rng.normal(size=(n_vis, D)) * 0.2
            gt[0, s_true0] = s_true1
            gt[1, s_true1] = s_true0
            # twins: near-identical descriptors with a mean-offset marker,
            # positions consistent with the decoy poses
            base_o = rng.normal(size=(n_out, D)).astype(np.float32)
            base_o[:, -MARKER:] = base_o[:, -MARKER:] * 0.5 + 1.2
            descs[0, s_out0] = base_o + rng.normal(size=(n_out, D)) * 0.1
            descs[1, s_out1] = base_o + rng.normal(size=(n_out, D)) * 0.1
            kpts[0, s_out0] = dp0 + rng.normal(size=dp0.shape) * NOISE_PX
            kpts[1, s_out1] = dp1 + rng.normal(size=dp1.shape) * NOISE_PX
            out_mask0[s_out0] = True
            # plain distractors
            kpts[0, rest0] = rng.uniform([10, 10], [W - 10, H - 10], (len(rest0), 2))
            kpts[1, rest1] = rng.uniform([10, 10], [W - 10, H - 10], (len(rest1), 2))
            descs[0, rest0] = rng.normal(size=(len(rest0), D))
            descs[1, rest1] = rng.normal(size=(len(rest1), D))
            descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
            kpts[..., 0] = np.clip(kpts[..., 0], 0, W - 1)
            kpts[..., 1] = np.clip(kpts[..., 1], 0, H - 1)
            # weights: class-balanced over labeled slots; twin slots weight 0
            weights = np.zeros((2, K + 1), np.float32)
            for r, s_out in ((0, s_out0), (1, s_out1)):
                labeled = np.ones(K + 1, bool)
                labeled[s_out] = False
                mfrac = max(n_vis / max(labeled.sum() - 1, 1), 1e-3)
                weights[r] = np.where(gt[r] >= 0, 0.5 / mfrac,
                                      0.5 / max(1.0 - mfrac, 1e-3))
                weights[r, s_out] = 0.0
            scores = np.full((V, K), 0.5, np.float32)
            T_gt = scene.relative_pose(0, 1)
            poses = np.stack([scene.poses[0], scene.poses[1]]).astype(np.float32)
            return (descs, kpts, scores, gt, weights, T_gt,
                    scene.intr[0].astype(np.float32), poses, out_mask0)

        def build_conf_set(n):
            cases = [build_case_outliers(SphereFieldScene(
                rng, n_views=V, H=H, W=W, f=F, baseline=0.9, rot_jitter=0.1),
                rng) for _ in range(n)]
            stack = lambda i: jnp.asarray(np.stack([c[i] for c in cases]))
            return tuple(stack(i) for i in range(9))

        (cg_descs, cg_kpts, cg_scores, cg_gt, cg_w, cg_T, cg_intr, cg_poses,
         cg_out0) = build_conf_set(N_EVAL)

        # stage 1 on the outlier fixture (same architecture/optimizer as the
        # main phase; reuses the jitted train_step)
        cg_vars = matcher.init(key, cg_kpts[:1], cg_scores[:1], cg_descs[:1],
                               jnp.full((1, V, 2), float(H)))
        params_cg, bstats_cg = cg_vars["params"], cg_vars["batch_stats"]
        opt_cg = tx.init(params_cg)
        t0 = time.time()
        for step in range(args.conf_steps1):
            b = build_conf_set(MB)
            params_cg, bstats_cg, opt_cg, l = train_step(
                params_cg, bstats_cg, opt_cg, b[1], b[2], b[0], b[3], b[4])
            if step % 50 == 0 or step == args.conf_steps1 - 1:
                print(f"conf-gate s1 step {step}: loss {float(l):.2f}",
                      flush=True)
        print(f"conf-gate stage 1: {args.conf_steps1} steps in "
              f"{time.time()-t0:.1f}s", flush=True)

        # stage 2: graft into the conf-MLP model, blended pose loss
        matcher_cg = MultiViewMatcher(MatcherConfig(
            gnn_layers=default_gnn_layers(3, 1), sinkhorn_iterations=30,
            conf_mlp=True, match_threshold=0.0,
        ))
        m2 = matcher_cg.init(key, cg_kpts[:1], cg_scores[:1], cg_descs[:1],
                             jnp.full((1, V, 2), float(H)))
        params_cg2, missing, _ = _graft(m2["params"], params_cg)
        bstats_cg2, _, _ = _graft(m2["batch_stats"], bstats_cg)
        print(f"conf-gate stage 2: grafted ({len(missing)} fresh leaves)",
              flush=True)
        ROT_W2, TRANS_W2 = 1597.0, 270.0  # scannet 2-tuple (`train.py:218`)
        # hotter conf-head LR than the reference stage-2 1e-5: that LR is
        # tuned for fine-tuning a converged head; here the head is a fresh
        # graft and must be trained from scratch (conf_gate_result.json:
        # 1e-5 random-walks, 1e-3 separates twins within 800 steps)
        tx_cg = build_optimizer(1e-5, 1.0, 0, 0, pose_loss=True,
                                conf_mlp_lr=1e-3)
        opt_cg2 = tx_cg.init(params_cg2)

        @jax.jit
        def train_step_cg(params, bstats, opt_state, ratio, bk, bs_, bd, bgi,
                          bgw, bintr, bposes):
            def loss_fn(p):
                out, upd = matcher_cg.apply(
                    {"params": p, "batch_stats": bstats}, bk, bs_, bd, mb_size,
                    train=True, full_output=True, mutable=["batch_stats"],
                )
                losses = _mlosses(out, bgi[:, None], bgw[:, None], bk,
                                  bintr, bposes, pose_loss=True)
                total, scaled = _combine(losses, 1, ratio, ROT_W2, TRANS_W2)
                return total, (upd["batch_stats"], scaled)

            (l, (new_bs, scaled)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx_cg.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, opt_state,
                    l, scaled)

        t0 = time.time()
        for step in range(args.conf_steps2):
            b = build_conf_set(MB)
            # short warmup then constant 0.8: matching is converged when
            # stage 2 starts; a long ramp starves the conf head of gradient
            ratio = 0.8 * min(1.0, step / max(1, args.conf_steps2 // 10))
            bintr = jnp.tile(b[6][:, None], (1, V, 1, 1))
            params_cg2, bstats_cg2, opt_cg2, l, scaled = train_step_cg(
                params_cg2, bstats_cg2, opt_cg2, ratio, b[1], b[2], b[0],
                b[3], b[4], bintr, b[7])
            if step % 50 == 0 or step == args.conf_steps2 - 1:
                print(f"conf-gate s2 step {step}: total {float(l):.2f} "
                      f"rot {float(scaled['rot_loss']):.4f}", flush=True)
        print(f"conf-gate stage 2: {args.conf_steps2} steps in "
              f"{time.time()-t0:.1f}s", flush=True)

        # benchmark BOTH weightings of the SAME matcher output through the
        # w8pt eval path (`eval_pairs.py` w8pt mode) -- only the weights differ
        out = matcher_cg.apply({"params": params_cg2, "batch_stats": bstats_cg2},
                               cg_kpts, cg_scores, cg_descs, e_size)
        m0 = out["matches0"][:, 0]
        gather = jnp.clip(m0, 0, K - 1)
        k1 = jnp.take_along_axis(cg_kpts[:, 1], gather[..., None], axis=1)

        def w8pt_auc(conf):
            conf = jnp.where(m0 >= 0, conf, 0.0)
            T_pred, info = estimate_relative_pose_w8pt(
                cg_kpts[:, 0], k1, cg_intr, cg_intr, conf,
                determine_inliers=True)
            errs = np.asarray(pose_error_max(cg_T, T_pred, degrees=True))
            errs = np.where(np.asarray(info.valid), errs, np.inf)
            return pose_auc(errs, [5, 10, 20])

        auc_score_w = w8pt_auc(out["matching_scores0"][:, 0])
        auc_conf_w = w8pt_auc(out["conf_scores"][:, 0])
        # mechanism check: learned confidence separates twins from true matches
        confn = np.asarray(out["conf_scores"][:, 0])
        m0n = np.asarray(m0)
        outn = np.asarray(cg_out0)
        matched = m0n >= 0
        conf_out = float(confn[matched & outn].mean())
        conf_true = float(confn[matched & ~outn & (np.asarray(cg_gt[:, 0, :-1]) >= 0)].mean())
        # how often do the twins actually get matched (the deception works)?
        deceived = float(matched[outn].mean())
        print(f"conf-gate: score-weighted AUC@5/10/20="
              f"{[round(a*100,1) for a in auc_score_w]}", flush=True)
        print(f"conf-gate: conf-weighted  AUC@5/10/20="
              f"{[round(a*100,1) for a in auc_conf_w]}", flush=True)
        print(f"conf-gate: twin matched frac {deceived:.2f}, mean conf "
              f"twins {conf_out:.3f} vs true {conf_true:.3f}", flush=True)
        result.update({
            "conf_gate_auc_score_weighted": auc_score_w,
            "conf_gate_auc_conf_weighted": auc_conf_w,
            "conf_gate_twin_matched_frac": deceived,
            "conf_gate_conf_on_twins": conf_out,
            "conf_gate_conf_on_true": conf_true,
            "conf_steps1": args.conf_steps1,
            "conf_steps2": args.conf_steps2,
        })

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    # oracle descriptors make even the untrained matcher strong at threshold 0,
    # so the gate asserts absolute post-training quality, not a before/after gap
    assert prec_a > 0.9, f"match precision too low: {prec_a}"
    assert frac_a > 0.5, f"matched fraction too low: {frac_a}"
    assert auc_a[2] > 0.5, f"pose AUC@20 too low: {auc_a[2]}"
    if args.stage2_steps > 0:
        # stage 2 must not collapse the matcher; conf-MLP-weighted poses must
        # stay benchmark-grade
        assert result["precision_stage2"] > 0.85, result["precision_stage2"]
        # observed 0.46-0.62 across rng streams; 0.40 floor catches collapse
        # without flaking on stream-to-stream variance
        assert result["auc_stage2"][2] > 0.40, result["auc_stage2"]
    if args.mv_tuples > 0:
        # the pose pipeline on exact matches must be benchmark-grade; the
        # learned-matcher number only guards against total transfer collapse
        assert result["auc_multi_view_oracle"][2] > 0.75, \
            result["auc_multi_view_oracle"]
        assert result["auc_multi_view"][2] > 0.08, result["auc_multi_view"]
    if args.conf_steps1 > 0:
        # the conf-MLP gate (reference raison d'etre): on deceptive outliers,
        # conf-weighted poses must BEAT score-weighted poses, the deception
        # must actually land (twins get matched), and the head must separate
        # twins from true matches
        assert result["conf_gate_twin_matched_frac"] > 0.5, \
            result["conf_gate_twin_matched_frac"]
        assert result["conf_gate_auc_conf_weighted"][2] > \
            result["conf_gate_auc_score_weighted"][2] + 0.05, \
            (result["conf_gate_auc_conf_weighted"],
             result["conf_gate_auc_score_weighted"])
        assert result["conf_gate_conf_on_twins"] < \
            0.6 * result["conf_gate_conf_on_true"], \
            (result["conf_gate_conf_on_twins"], result["conf_gate_conf_on_true"])
    if args.mv_train_steps > 0:
        # the flagship gate: the V=5-TRAINED model's learned matches through
        # the full multi-view pipeline must be benchmark-grade (oracle ceiling
        # ~89%), decisively beat the V=2 transfer, and not degrade as training
        # converges (round-1 failure mode)
        auc_tr = result["auc_multi_view_trained"]
        assert auc_tr[2] > 0.60, f"V=5-trained AUC@20 too low: {auc_tr}"
        assert auc_tr[2] > result["auc_multi_view"][2] + 0.20, \
            (auc_tr, result["auc_multi_view"])
        assert auc_tr[2] >= result["auc_multi_view_trained_mid"][2] - 0.08, \
            (auc_tr, result["auc_multi_view_trained_mid"])
    print("QUALITY GATE PASSED")
    return result


if __name__ == "__main__":
    main()
