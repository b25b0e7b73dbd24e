"""Glow backward attribution: where do the ~24 ms of backward go?

glow_decomposition.py measured full step 35.07 ms = forward 9.87 +
backward 23.90 + update, with conv grads (2.07x forward microbench)
accounting for ~20.4 ms — leaving ~3.5 ms of glue unattributed.  This
script closes that gap with the flagship's in-situ identity-swap
methodology: grad-of-loss probes on the FULL model (L=3, K=16, hidden 256,
batch 512, bf16) with one component class at a time swapped for a cheap
identity that keeps its parameters in the graph, plus a plumbing-only model
(Squeeze/Merge/base, no GlowBlocks).

  grad_full           baseline loss+grad (glow_decomposition grad_only)
  grad_actnorm_id     ActNorm.inverse -> identity
  grad_1x1_id         Invertible1x1Conv.inverse -> identity
  grad_coupling_id    AffineCouplingBlock.inverse -> identity (whole conv
                      coupling removed; the conv fwd+bwd bucket)
  grad_plumbing       Squeeze/Merge/base/log-det chain only (no GlowBlocks)
  loss_* variants     same swaps, forward only — so each component's
                      BACKWARD share = (grad_full-grad_swap) - (loss_full-loss_swap)

Run:  env PYTHONPATH="/root/.axon_site:/root/repo:/root/repo/examples" \
          python examples/glow_backward_probe.py
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

import normflows_tpu as nf
from normflows_tpu import flows as nfl
from normflows_tpu.utils import preprocessing, enable_compilation_cache

from flagship_decomposition import scan_time
from glow_image import build_glow, synthetic_images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", type=int, default=30)
    ap.add_argument("--short", type=int, default=6)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (tiny model/images, 2-step scans)")
    args = ap.parse_args()
    enable_compilation_cache()

    if args.tiny:
        L, K, hidden, side = 2, 2, 32, 8
        args.batch, args.long, args.short = 16, 2, 1
    else:
        L, K, hidden, side = 3, 16, 256, 32
    B = args.batch
    x_all, y_all = synthetic_images(jax.random.key(7), B + 64, (3, side, side))
    scale = preprocessing.Scale(255.0 / 256.0)
    jitter = preprocessing.Jitter(1.0 / 256.0)
    model = build_glow(L, K, hidden, (3, side, side), key=jax.random.key(0))
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    model = model.init_actnorm(
        jitter(scale(x_all[:64]), jax.random.key(8)), y_all[:64])
    x = jitter(scale(x_all[:B]), jax.random.key(9))
    y = y_all[:B]
    diff, rest = nf.partition(model)

    results = {}

    def report(name, sec, note=""):
        results[name] = sec * 1e3
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3),
                          "note": note}), flush=True)

    def grad_body(c):
        d, _ = c
        _, grads = jax.value_and_grad(
            lambda dd: nf.combine(dd, rest).forward_kld(x, y))(d)
        return jax.tree.map(lambda p, g: p + 1e-30 * g, d, grads), _

    def loss_body(c):
        xx, acc = c
        loss = model.forward_kld(xx, y)
        return xx * (1 + 1e-30 * loss), acc + loss

    def measure_pair(tag, note=""):
        t_g = scan_time(grad_body, (diff, jnp.float32(0)),
                        args.long, args.short)
        report(f"grad_{tag}", t_g, note)
        t_l = scan_time(loss_body, (x, jnp.float32(0)),
                        args.long, args.short)
        report(f"loss_{tag}", t_l, note)
        return t_g, t_l

    # ---- baseline ---------------------------------------------------------
    measure_pair("full", "L=3 K=16 h=256 bf16 grad step")

    # ---- identity swaps (class-level, in situ) ---------------------------
    def id_like(consume):
        def fn(self, z, context=None, *, key=None):
            s = sum(jnp.sum(l) for l in jax.tree.leaves(consume(self))
                    if hasattr(l, "dtype"))
            z = z * (1.0 + 1e-30 * s.astype(z.dtype))
            return z, jnp.zeros(z.shape[0], z.dtype)
        return fn

    swaps = {
        "actnorm_id": (nfl.ActNorm, lambda m: (m.s, m.t)),
        "1x1_id": (nfl.Invertible1x1Conv, lambda m: jax.tree.leaves(m)),
        "coupling_id": (nfl.AffineCouplingBlock, lambda m: jax.tree.leaves(m)),
    }
    for tag, (cls_, consume) in swaps.items():
        real_fwd, real_inv = cls_.forward, cls_.inverse
        try:
            cls_.forward = id_like(consume)
            cls_.inverse = id_like(consume)
            measure_pair(tag, f"{cls_.__name__} -> identity")
        finally:
            cls_.forward, cls_.inverse = real_fwd, real_inv

    # ---- plumbing-only model (no GlowBlocks at all) -----------------------
    plumb = model.replace(
        flows=tuple(tuple(lv[-1:]) for lv in model.flows))  # just the Squeeze
    pdiff, prest = nf.partition(plumb)

    def plumb_grad_body(c):
        d, _ = c
        _, grads = jax.value_and_grad(
            lambda dd: nf.combine(dd, prest).forward_kld(x, y))(d)
        return jax.tree.map(lambda p, g: p + 1e-30 * g, d, grads), _

    t_p = scan_time(plumb_grad_body, (pdiff, jnp.float32(0)),
                    args.long, args.short)
    report("grad_plumbing", t_p, "Squeeze/Merge/base/log-det only")

    # ---- attribution ------------------------------------------------------
    gf, lf = results["grad_full"], results["loss_full"]
    rows = {"full_grad_ms": round(gf, 2), "full_loss_ms": round(lf, 2),
            "backward_ms": round(gf - lf, 2)}
    for tag in ("actnorm_id", "1x1_id", "coupling_id"):
        d_total = gf - results[f"grad_{tag}"]
        d_fwd = lf - results[f"loss_{tag}"]
        rows[f"{tag.replace('_id', '')}_total_ms"] = round(d_total, 2)
        rows[f"{tag.replace('_id', '')}_bwd_ms"] = round(d_total - d_fwd, 2)
    rows["plumbing_grad_ms"] = round(results["grad_plumbing"], 2)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
