"""Glow-step time decomposition at the hardware-optimal config.

Companion to examples/flagship_decomposition.py for the image stack: the
Glow forward-KLD train step (L=3, K=16, hidden 256, batch 512 bf16 — the
operating point validated in QUALITY.md) runs at ~26% MFU; this script
attributes the time with the same scan-chunked RTT-cancelled methodology.

Components:
  full            forward-KLD loss + grad + Adamax (the glow_batch_sweep step)
  grad_only       loss + grad, axpy instead of the optimizer
  loss_only       multiscale log_prob forward
  level{i}_fwd    that level's K=16 GlowBlock stack alone (inverse direction,
                  exact post-squeeze shapes)
  convnet{i}_fwd  the coupling ConvNet2d stacks of level i alone (the matmul
                  meat: K nets at exact shapes)
  convnet{i}_grad convnet{i}_fwd + parameter grads
  conv_ceiling_{i} dense bf16 conv at the exact level-i hot shape

Run:  env PYTHONPATH="/root/.axon_site:/root/repo:/root/repo/examples" \
          python examples/glow_decomposition.py
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu.utils import preprocessing, enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost

from flagship_decomposition import scan_time, flops_of
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

    opt = optax.chain(optax.add_decayed_weights(1e-5), optax.adamax(1e-3))
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    peak = chip_peak_flops()

    def report(name, sec, flops=None, note=""):
        row = {
            "component": name, "ms": round(sec * 1e3, 3),
            "flops": flops,
            "tflops": round(flops / sec / 1e12, 1) if flops else None,
            "mfu": round(flops / sec / peak, 3) if flops else None,
            "note": note,
        }
        print(json.dumps(row), flush=True)

    # ---- full step --------------------------------------------------------
    def full_body(c):
        diff, opt_state = c
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state

    def full_single(diff, opt_state):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    f_full = flops_of(full_single, diff, opt_state)
    t_full = scan_time(full_body, (diff, opt_state), args.long, args.short)
    report("full", t_full, f_full, f"batch {B} bf16 train step")

    # ---- grad only --------------------------------------------------------
    def grad_body(c):
        diff, _ = c
        _, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x, y))(diff)
        return jax.tree.map(lambda p, g: p + 1e-30 * g, diff, grads), _

    t_grad = scan_time(grad_body, (diff, jnp.float32(0)),
                       args.long, args.short)
    report("grad_only", t_grad)

    # ---- loss only --------------------------------------------------------
    def loss_body(c):
        xx, acc = c
        loss = model.forward_kld(xx, y)
        return xx * (1 + 1e-30 * loss), acc + loss

    f_loss = flops_of(lambda xx: model.forward_kld(xx, y), x)
    t_loss = scan_time(loss_body, (x, jnp.float32(0)), args.long, args.short)
    report("loss_only", t_loss, f_loss)

    # ---- per-level stacks + conv nets ------------------------------------
    C0 = 3
    for i in range(L):
        cs = C0 * 2 ** (L + 1 - i)
        hw = side // 2 ** (L - i)
        level_flows = model.flows[i][:-1]  # drop the Squeeze
        zi = jax.random.normal(jax.random.key(20 + i), (B, cs, hw, hw)) * 0.3

        def level_body(c, level_flows=level_flows):
            z, acc = c
            ld_tot = jnp.zeros(z.shape[0])
            for fl in level_flows:
                z, ld = fl.inverse(z)
                ld_tot = ld_tot + ld
            return jnp.clip(z, -3, 3), acc + jnp.mean(ld_tot)

        t_level = scan_time(level_body, (zi, jnp.float32(0)),
                            args.long, args.short)
        report(f"level{i}_fwd", t_level,
               note=f"K={len(level_flows)} GlowBlocks at ({cs},{hw},{hw})")

        # coupling ConvNet2d stacks alone at exact shapes
        nets = [fl.flows[0].coupling.param_map for fl in level_flows]
        half = cs - cs // 2
        xin = jax.random.normal(jax.random.key(30 + i), (B, half, hw, hw)) * 0.3

        def conv_body(c, nets=nets):
            xx, acc = c
            for net in nets:
                out = net(xx)
                acc = acc + jnp.mean(out)
            return xx * (1 + 1e-30 * acc), acc

        def conv_single(xx, nets=nets):
            return sum(jnp.mean(net(xx)) for net in nets)

        f_conv = flops_of(conv_single, xin)
        t_conv = scan_time(conv_body, (xin, jnp.float32(0)),
                           args.long, args.short)
        report(f"convnet{i}_fwd", t_conv, f_conv,
               f"{len(nets)} ConvNet2d at ({half},{hw},{hw})->hidden {hidden}")

        net_diffs, net_rests = zip(*(nf.partition(n) for n in nets))

        def conv_grad_body(c, net_rests=net_rests, xin=xin):
            nds, acc = c

            def f(nds_):
                return sum(
                    jnp.mean(nf.combine(nd, nr)(xin))
                    for nd, nr in zip(nds_, net_rests))

            g = jax.grad(f)(list(nds))
            return tuple(jax.tree.map(lambda p, gg: p + 1e-30 * gg,
                                      list(nds), g)), acc

        t_cg = scan_time(conv_grad_body, (net_diffs, jnp.float32(0)),
                         args.long, args.short)
        report(f"convnet{i}_grad", t_cg)

    # ---- dense conv ceiling at the dominant shape (level 0) --------------
    cs = C0 * 2 ** (L + 1)
    half = cs - cs // 2
    hw = side // 2 ** L
    a = jax.random.normal(jax.random.key(40), (B, hidden, hw, hw)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.key(41), (hidden, hidden, 3, 3)) * 0.02).astype(jnp.bfloat16)

    def ceil_body(c):
        aa, acc = c
        for _ in range(16):
            aa = jax.lax.conv_general_dilated(
                aa, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")) * 1e-2
        return aa, acc + jnp.float32(jnp.sum(aa[0, 0, 0, :1]))

    f_ceil = 16 * 2 * B * hidden * hidden * 9 * hw * hw
    t_ceil = scan_time(ceil_body, (a, jnp.float32(0)), args.long, args.short)
    report("conv_ceiling_hidden3x3", t_ceil, float(f_ceil),
           f"16x dense bf16 3x3 conv ({hidden}->{hidden}) at {hw}x{hw}, batch {B}")


if __name__ == "__main__":
    main()
