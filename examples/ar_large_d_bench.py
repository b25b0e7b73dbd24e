"""Large-D autoregressive benchmark: MAF + AR-RQS at D=64.

The flagship bench proves the AR stack only at D=2 (2 features); the
reference's generic AR use case is D~dozens with the inverse running D
sequential MADE passes (/root/reference/normflows/flows/affine/
autoregressive.py:29-38).  The round-4 transposed fast path is gated to
F <= 8, so a D=64 model takes the general (fori_loop) path — this script
measures what that path actually costs and attributes it:

  maf_fwd / maf_inv      MaskedAffineAutoregressive density / sampling pass
  rqs_fwd / rqs_inv      AR-RQS density / sampling pass
  rqs_train              reverse-KLD train step, K-layer AR-RQS stack
                         (sampling direction: K * D sequential MADE passes
                          + grad)
  made_fwd               one MADE pass alone at exact shapes
  identity_spline_inv    rqs_inv with the elementwise spline swapped for
                         identity (in-situ ablation: isolates spline +
                         layout overhead from the MADE recursion)
  matmul_ceiling         dense bf16 matmul chain at MADE shapes

Methodology: scan-chunked, RTT-cancelled, scalar-forced timings
(docs/performance.md "Benchmark methodology"); inputs vary along the scan
carry so XLA cannot hoist loop-invariant work (CLAUDE.md trap).

Run:  env PYTHONPATH="/root/.axon_site:/root/repo:/root/repo/examples" \
          python examples/ar_large_d_bench.py
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu import flows, distributions
from normflows_tpu.utils import enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost

from flagship_decomposition import scan_time, flops_of


def robust_scan_time(body, carry, long, short):
    """scan_time, re-measured with amplified lengths for tiny probes.

    The long/short differencing's noise floor is the tunnel-RTT jitter over
    (long - short) iterations; for sub-0.1-ms probes (made_fwd, the bf16
    matmul chain) that jitter can exceed the differenced work and even
    produce NEGATIVE estimates (observed in one session: made_fwd
    -0.007 ms).  When the differenced work is under ~8 ms, re-time with
    10x/2x lengths — same quantity, ~10x the signal."""
    t = scan_time(body, carry, long, short)
    if t * (long - short) < 8e-3:
        t = scan_time(body, carry, 10 * long, 2 * short)
    return t


def build_stack(D, hidden, num_bins, K_layers, kind="rqs"):
    layers = []
    for i in range(K_layers):
        if kind == "rqs":
            layers.append(
                flows.AutoregressiveRationalQuadraticSpline.create(
                    jax.random.key(i), D, 1, hidden, num_bins=num_bins,
                    permute_mask=True, rng_seed=i,
                )
            )
        else:
            layers.append(
                flows.MaskedAffineAutoregressive.create(
                    jax.random.key(i), D, hidden, rng_seed=i)
            )
        layers.append(flows.LULinearPermute.create(D, key=jax.random.key(100 + i)))
    base = distributions.DiagGaussian.create(D)
    target = distributions.DiagGaussian.create(D).replace(
        loc=jnp.full((1, D), 0.5), log_scale=jnp.full((1, D), -0.2))
    return nf.NormalizingFlow.create(base, layers, p=target)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--bins", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--long", type=int, default=20)
    ap.add_argument("--short", type=int, default=4)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bf16 MADE matmuls (default on; --no-bf16 for f32)")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (D=9, tiny nets, 2-step scans;"
                         " D stays above the sliced-inverse gate so the"
                         " sliced-vs-naive ctx probes measure DIFFERENT"
                         " paths even in smoke runs)")
    args = ap.parse_args()
    enable_compilation_cache()
    if args.tiny:
        args.d, args.hidden, args.bins = 9, 32, 4
        args.batch, args.layers = 256, 2
        args.long, args.short = 2, 1
        # f32 on the CPU smoke path: the sliced inverse's transposed bf16
        # dot hits an unimplemented XLA-CPU DotThunk (BF16 x BF16 = F32)
        args.bf16 = False

    D, H, B, K = args.d, args.hidden, args.batch, args.bins
    peak = chip_peak_flops()
    rows = []

    def report(name, sec, flops=None, note=""):
        row = {
            "probe": name, "ms": round(sec * 1e3, 3),
            "tflops": round(flops / sec / 1e12, 2) if flops else None,
            "mfu": round(flops / sec / peak, 3)
            if flops and peak == peak else None,
            "note": note,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        return sec

    # ---- single layers ----------------------------------------------------
    maf = flows.MaskedAffineAutoregressive.create(jax.random.key(0), D, H)
    rqs_wrap = flows.AutoregressiveRationalQuadraticSpline.create(
        jax.random.key(1), D, 1, H, num_bins=K, permute_mask=True)
    # NB: the wrapper flips directions (wrapper.py forward = mprqat.inverse);
    # benchmark the inner transform so forward = density (1 MADE pass) and
    # inverse = sampling (D sequential passes), same convention as MAF.
    rqs = rqs_wrap.mprqat
    if args.bf16:
        maf = nf.utils.set_compute_dtype(maf, "bfloat16")
        rqs = nf.utils.set_compute_dtype(rqs, "bfloat16")
    x0 = jax.random.normal(jax.random.key(2), (B, D))

    def layer_body(layer, direction):
        def body(c):
            x, acc = c
            y, ld = getattr(layer, direction)(x)
            return jnp.clip(y, -3.0, 3.0), acc + jnp.mean(ld)
        return body

    for name, layer in (("maf", maf), ("rqs", rqs)):
        for direction in ("forward", "inverse"):
            t = robust_scan_time(layer_body(layer, direction),
                          (x0, jnp.float32(0)), args.long, args.short)
            note = ("1 MADE pass" if direction == "forward"
                    else f"1 + {D - 1} sequential MADE passes")
            report(f"{name}_{'fwd' if direction == 'forward' else 'inv'}",
                   t, note=note)

    # ---- conditional sampling pass (round 5): cached context projections --
    # The context is constant across the D recursion passes, so the sliced
    # inverse projects it once (nets/made.py context_cache_t); the naive
    # recursion re-projects it in every one of the D MADE passes.  Context
    # varies along the scan carry (CLAUDE.md loop-invariant-hoisting trap).
    C_CTX = 8
    rqs_ctx = flows.AutoregressiveRationalQuadraticSpline.create(
        jax.random.key(7), D, 1, H, num_context_channels=C_CTX, num_bins=K,
        permute_mask=True).mprqat
    if args.bf16:
        rqs_ctx = nf.utils.set_compute_dtype(rqs_ctx, "bfloat16")
    ctx0 = jax.random.normal(jax.random.key(8), (B, C_CTX))

    def ctx_body(c):
        x, ctx, acc = c
        y, ld = rqs_ctx.inverse(x, ctx)
        return (jnp.clip(y, -3.0, 3.0), jnp.roll(ctx, 1, axis=0),
                acc + jnp.mean(ld))

    report("rqs_inv_ctx",
           robust_scan_time(ctx_body, (x0, ctx0, jnp.float32(0)),
                     args.long, args.short),
           note="conditional sampling pass, sliced + cached ctx projections")
    from normflows_tpu.flows.affine.autoregressive import (
        Autoregressive as _ARBase,
    )

    real_gate = _ARBase._sliced_inverse_ok
    try:
        _ARBase._sliced_inverse_ok = (
            lambda self, inputs, dropout_on, context=None: False)
        report("rqs_inv_ctx_naive",
               robust_scan_time(ctx_body, (x0, ctx0, jnp.float32(0)),
                         args.long, args.short),
               note="conditional sampling pass, naive D-pass recursion"
                    " (sliced gate forced off)")
    finally:
        _ARBase._sliced_inverse_ok = real_gate

    # ---- one MADE pass alone ---------------------------------------------
    made = rqs.autoregressive_net

    def made_body(c):
        x, acc = c
        out = made(x)
        return x + out[:, :D].astype(x.dtype) * 1e-9, acc + jnp.mean(out)

    f_made = flops_of(lambda x: jnp.mean(made(x)), x0)
    t_made = report("made_fwd",
                    robust_scan_time(made_body, (x0, jnp.float32(0)),
                              args.long, args.short),
                    f_made, f"B={B} D={D} H={H} mult={3 * K + 1}")

    # ---- in-situ spline ablation: identity elementwise --------------------
    from normflows_tpu.flows.neural_spline.autoregressive import (
        MaskedPiecewiseRationalQuadraticAutoregressive as MP,
    )

    real_elem = MP._elementwise
    try:
        def ident(self, inputs, params, inverse):
            s = jnp.sum(params.astype(inputs.dtype), axis=-1) * 1e-12
            return (inputs * (1.0 + s.reshape(inputs.shape[0], -1)[:, :inputs.shape[1]]),
                    jnp.zeros(inputs.shape[0], inputs.dtype))

        MP._elementwise = ident
        t_ident = report(
            "identity_spline_inv",
            robust_scan_time(layer_body(rqs, "inverse"), (x0, jnp.float32(0)),
                      args.long, args.short),
            note="rqs_inv with spline -> identity (isolates MADE recursion)")
    finally:
        MP._elementwise = real_elem

    # ---- K-layer reverse-KLD train step ------------------------------------
    model = build_stack(D, H, K, args.layers, "rqs")
    if args.bf16:
        model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)

    def train_body(c):
        diff, opt_state, key = c
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(sub, B))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, key

    def train_single(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, B))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    # NB: cost_analysis counts each fori_loop body ONCE (the scan-counting
    # pitfall, docs/performance.md "Benchmark methodology"), and this step's
    # sampling direction is a D-iteration recursion per layer — so the flops
    # figure (and mfu) here is a ~D-fold UNDERCOUNT, kept only as a lower
    # bound; the honest utilization story is the per-probe attribution above.
    f_train = flops_of(train_single, diff, opt_state, jax.random.key(1))
    t_train = report(
        "rqs_train",
        robust_scan_time(train_body, (diff, opt_state, jax.random.key(0)),
                  args.long, args.short),
        f_train,
        f"{args.layers}-layer AR-RQS + LULinearPermute reverse-KLD step"
        " (flops/mfu = loop-body-once lower bound)")

    # ---- forward-KLD (density-estimation) train step: the MAF regime -------
    # The reference's primary large-D AR workload (MAF/NSF density
    # estimation on tabular data) trains via forward KLD: ONE MADE pass per
    # layer (no sequential recursion), so the step is dense-matmul-bound and
    # its flops count is loop-free (trustworthy, unlike rqs_train's).
    xb0 = jax.random.normal(jax.random.key(9), (B, D))

    def fkld_single(diff, opt_state, x):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).forward_kld(x))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    def fkld_body(c):
        diff, opt_state, x = c
        diff, opt_state, loss = fkld_single(diff, opt_state, x)
        return diff, opt_state, x * (1.0 + 1e-9 * loss)

    f_fkld = flops_of(fkld_single, diff, opt_state, xb0)
    report("rqs_train_fkld",
           robust_scan_time(fkld_body, (diff, opt_state, xb0),
                     args.long, args.short),
           f_fkld,
           f"{args.layers}-layer AR-RQS forward-KLD (density) step")

    # ---- matmul ceiling at MADE shapes -------------------------------------
    a0 = jax.random.normal(jax.random.key(5), (B, H), jnp.bfloat16)
    w0 = jax.random.normal(jax.random.key(6), (H, H), jnp.bfloat16)

    def mm_body(c):
        a, acc = c
        for _ in range(8):
            a = (a @ w0) * 1e-2
        return a, acc + jnp.float32(jnp.sum(a[0, :1]))

    t_mm = robust_scan_time(mm_body, (a0, jnp.float32(0)), args.long, args.short)
    report("matmul_ceiling", t_mm, float(8 * 2 * B * H * H),
           f"8 dense bf16 ({B}x{H})@({H}x{H})")

    # ---- attribution summary ----------------------------------------------
    t = {r["probe"]: r["ms"] for r in rows}
    print(json.dumps({"summary": {
        "d": D, "hidden": H, "batch": B,
        "rqs_inv_ms": t.get("rqs_inv"),
        "made_recursion_ms": t.get("identity_spline_inv"),
        "spline_plus_layout_ms": round(
            t.get("rqs_inv", 0) - t.get("identity_spline_inv", 0), 3),
        "d_x_made_fwd_ms": round(D * t.get("made_fwd", 0), 3),
        "serialization_overhead_ms": round(
            t.get("identity_spline_inv", 0) - D * t.get("made_fwd", 0), 3),
        "train_samples_per_sec": round(B / (t.get("rqs_train", 1) * 1e-3), 0),
        "train_fkld_samples_per_sec": round(
            B / (t.get("rqs_train_fkld", 1) * 1e-3), 0),
    }}))


if __name__ == "__main__":
    main()
