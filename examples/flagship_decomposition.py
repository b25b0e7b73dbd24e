"""Flagship-step time decomposition: where do the milliseconds go?

The headline bench (bench.py) reports ~30% MFU for the NSF-cylinder
reverse-KLD train step on a chip measured to attain 89% of datasheet peak
(docs/performance.md).  This script attributes the remaining time with
measurements, not guesses: each component below is run at the EXACT flagship
shapes (K=12, hidden 512, 2^14 samples, bf16 compute) inside a single
``lax.scan`` dispatch, timed with tunnel-RTT cancellation (long/short scan
differencing) and scalar forcing — the axon measurement rules from
docs/performance.md "Benchmark methodology".

Components:
  full          sample + reverse-KLD loss + grad + Adam update (the bench step)
  grad_only     loss + grad, no optimizer update
  loss_only     forward loss, no grad
  sample_only   q0 sample + 12-layer flow transport (no target log_prob)
  base_target   q0 sample + target log_prob only (no flow layers)
  made_fwd      the 12 full-batch + 12 batch-1 MADE passes alone (forward)
  made_fwd_par  hypothetical: 12 full passes with no sequential dependency
  made_grad     made_fwd + parameter gradients
  spline_fwd    the elementwise RQS inverse alone at exact param shapes
  spline_grad   spline_fwd + parameter gradients
  adam_only     Adam update + apply on the exact parameter tree
  matmul_ceiling dense bf16 (2^14 x 512) @ (512 x 512) chain (per-matmul s.o.l.)

Run:  env PYTHONPATH="/root/.axon_site:/root/repo" python examples/flagship_decomposition.py
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

import normflows_tpu as nf
from normflows_tpu.utils import enable_compilation_cache
from normflows_tpu.utils.profiling import chip_peak_flops, executable_cost


def scan_time(body, init_carry, long_len=40, short_len=8, reps=3):
    """Per-iteration seconds for ``carry -> carry`` body, net of dispatch.

    Times one jitted ``lax.scan`` dispatch at two lengths and differences
    them, cancelling the tunnel RTT and any fixed dispatch cost.  The scan
    output ends in a scalar reduction which is forced via float() (only
    scalar outputs reliably block under axon).
    """

    def chunk(carry, n):
        def step(c, _):
            return body(c), None

        carry, _ = jax.lax.scan(step, carry, None, length=n)
        # scalar force: reduce every leaf to one number
        return carry, sum(
            jnp.sum(l) * 1e-30 for l in jax.tree.leaves(carry)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        )

    times = {}
    for n in (short_len, long_len):
        compiled = jax.jit(lambda c: chunk(c, n)).lower(init_carry).compile()
        carry, s = compiled(init_carry)
        float(s)  # warmup + force
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            carry, s = compiled(init_carry)
            float(s)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[long_len] - times[short_len]) / (long_len - short_len)


def flops_of(fn, *args):
    """AOT-compiled single-invocation FLOP count (scan-counting-safe)."""
    ca = executable_cost(jax.jit(fn).lower(*args).compile())
    return float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", type=int, default=40)
    ap.add_argument("--short", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (tiny model/N, 2-step scans) — "
                         "numbers are meaningless, only checks the probe runs")
    args = ap.parse_args()
    enable_compilation_cache()

    import bench

    if args.tiny:
        model = bench.build_model(2, 32, num_bins=4)
        N = 2**8
        args.long, args.short = 2, 1
    else:
        model = bench.build_model()
        N = 2**14
    model = nf.utils.set_compute_dtype(model, "bfloat16")
    opt = optax.adam(5e-4)
    diff, rest = nf.partition(model)
    opt_state = opt.init(diff)
    n_layers = len(model.flows)
    hidden = model.flows[0].mprqat.autoregressive_net.hidden_features

    rows = []

    def report(name, sec, flops=None, note=""):
        peak = chip_peak_flops()
        row = {
            "component": name,
            "ms": round(sec * 1e3, 3),
            "flops": flops,
            "tflops": round(flops / sec / 1e12, 1) if flops else None,
            "mfu": round(flops / sec / peak, 3) if flops else None,
            "note": note,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- full train step --------------------------------------------------
    def full_body(c):
        diff, opt_state, key = c
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(sub, N))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, key

    def full_single(diff, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(key, N))(diff)
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state, loss

    f_full = flops_of(full_single, diff, opt_state, jax.random.key(1))
    t_full = scan_time(full_body, (diff, opt_state, jax.random.key(0)),
                       args.long, args.short)
    report("full", t_full, f_full, "the bench.py step")

    # ---- grad only (no optimizer) ----------------------------------------
    def grad_body(c):
        diff, key = c
        key, sub = jax.random.split(key)
        _, grads = jax.value_and_grad(
            lambda d: nf.combine(d, rest).reverse_kld(sub, N))(diff)
        new_diff = jax.tree.map(lambda p, g: p + 1e-30 * g, diff, grads)
        return new_diff, key

    t_grad = scan_time(grad_body, (diff, jax.random.key(0)),
                       args.long, args.short)
    report("grad_only", t_grad, note="loss+grad, axpy instead of Adam")

    # ---- loss only --------------------------------------------------------
    def loss_body(c):
        key, acc = c
        key, sub = jax.random.split(key)
        loss = model.reverse_kld(sub, N)
        return key, acc + loss

    f_loss = flops_of(lambda k: model.reverse_kld(k, N), jax.random.key(1))
    t_loss = scan_time(loss_body, (jax.random.key(0), jnp.float32(0)),
                       args.long, args.short)
    report("loss_only", t_loss, f_loss)

    # ---- sampling transport only -----------------------------------------
    def sample_body(c):
        key, acc = c
        key, sub = jax.random.split(key)
        z, log_q = model.sample(sub, N)
        return key, acc + jnp.mean(z) + jnp.mean(log_q)

    t_sample = scan_time(sample_body, (jax.random.key(0), jnp.float32(0)),
                         args.long, args.short)
    report("sample_only", t_sample, note="q0 + 12-layer transport, no target")

    # ---- base + target only ----------------------------------------------
    def bt_body(c):
        key, acc = c
        key, sub = jax.random.split(key)
        z, log_q = model.q0.sample_and_log_prob(sub, N)
        lp = model.p.log_prob(z)
        return key, acc + jnp.mean(lp) + jnp.mean(log_q)

    t_bt = scan_time(bt_body, (jax.random.key(0), jnp.float32(0)),
                     args.long, args.short)
    report("base_target", t_bt)

    # ---- MADE passes alone ------------------------------------------------
    mades = [l.mprqat.autoregressive_net for l in model.flows]
    x0 = jax.random.normal(jax.random.key(2), (N, 2))

    def made_fwd_body(c):
        x, acc = c
        for made in mades:
            p1 = made(x[:1])                      # batch-1 first pass
            out = made(x)                         # full second pass
            acc = acc + jnp.sum(p1) * 1e-9 + jnp.mean(out)
            x = x + out[:, :2] * 1e-9             # sequential dependence
        return x, acc

    def made_fwd_single(x):
        acc = jnp.float32(0)
        for made in mades:
            acc = acc + jnp.sum(made(x[:1])) * 1e-9 + jnp.mean(made(x))
        return acc

    f_made = flops_of(made_fwd_single, x0)
    t_made = scan_time(made_fwd_body, (x0, jnp.float32(0)),
                       args.long, args.short)
    report("made_fwd", t_made, f_made, "12 full + 12 batch-1 passes, sequential")

    def made_par_body(c):
        x, acc = c
        outs = [made(x) for made in mades]        # no inter-pass dependency
        acc = acc + sum(jnp.mean(o) for o in outs)
        return x + outs[0][:, :2] * 1e-9, acc

    t_made_par = scan_time(made_par_body, (x0, jnp.float32(0)),
                           args.long, args.short)
    report("made_fwd_par", t_made_par, note="12 independent full passes")

    made_diffs, made_rests = zip(*(nf.partition(m) for m in mades))

    def made_grad_body(c):
        mds, x = c

        def f(mds_):
            acc = jnp.float32(0)
            for md, mr in zip(mds_, made_rests):
                made = nf.combine(md, mr)
                acc = acc + jnp.sum(made(x[:1])) * 1e-9 + jnp.mean(made(x))
            return acc

        grads = jax.grad(f)(list(mds))
        new = jax.tree.map(lambda p, g: p + 1e-30 * g, list(mds), grads)
        return tuple(new), x

    t_made_grad = scan_time(made_grad_body, (made_diffs, x0),
                            args.long, args.short)
    report("made_grad", t_made_grad, note="made_fwd + parameter grads")

    # ---- spline elementwise alone ----------------------------------------
    layer0 = model.flows[0].mprqat
    P = 3 * layer0.num_bins + 1
    params0 = jax.random.normal(jax.random.key(3), (N, 2 * P)) * 0.1
    z0 = jax.random.normal(jax.random.key(4), (N, 2))

    def spline_body(c):
        z, acc = c
        for _ in range(n_layers):
            out, ld = layer0._elementwise(z, params0, inverse=True)
            z = jnp.clip(out, -3.0, 3.0)
            acc = acc + jnp.mean(ld)
        return z, acc

    t_spline = scan_time(spline_body, (z0, jnp.float32(0)),
                         args.long, args.short)
    report("spline_fwd", t_spline, note="12 x elementwise RQS inverse, exact shapes")

    def spline_grad_body(c):
        prm, z = c
        # grads wrt the param tensor (stand-in for the MADE-output cotangent
        # chain).  NOTE: this is ONE elementwise backward scaled by 12 — a
        # single-call cost proxy, not 12 distinct calls (the in-situ story is
        # the identity-swap ablation in flagship_backward_probe.py); both
        # output and log-det cotangents are exercised.
        g = jax.grad(
            lambda p: float(n_layers) * sum(
                jnp.mean(t) for t in layer0._elementwise(z, p, inverse=True))
        )(prm)
        return prm + 1e-30 * g, z

    t_spline_grad = scan_time(spline_grad_body, (params0, z0),
                              args.long, args.short)
    report("spline_grad", t_spline_grad, note="12 x elementwise backward (param cotangents)")

    # ---- Adam update alone ------------------------------------------------
    def adam_body(c):
        diff, opt_state = c
        grads = jax.tree.map(lambda p: p * 1e-30, diff)  # carry-dependent
        updates, opt_state = opt.update(grads, opt_state, diff)
        return optax.apply_updates(diff, updates), opt_state

    t_adam = scan_time(adam_body, (diff, opt_state), args.long, args.short)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(diff))
    report("adam_only", t_adam, note=f"{n_params / 1e6:.2f}M params")

    # ---- dense matmul ceiling at MADE shapes ------------------------------
    a0 = jax.random.normal(jax.random.key(5), (N, hidden), jnp.bfloat16)
    w0 = jax.random.normal(jax.random.key(6), (hidden, hidden), jnp.bfloat16)

    def mm_body(c):
        a, acc = c
        for _ in range(2 * n_layers):
            a = (a @ w0) * 1e-2
        return a, acc + jnp.float32(jnp.sum(a[0, :1]))

    f_mm = 2 * n_layers * 2 * N * hidden * hidden
    t_mm = scan_time(mm_body, (a0, jnp.float32(0)), args.long, args.short)
    report("matmul_ceiling", t_mm, float(f_mm),
           f"{2 * n_layers} dense bf16 ({N} x {hidden})@({hidden} x {hidden})")

    # ---- attribution summary ---------------------------------------------
    print(json.dumps({
        "summary": {
            "full_ms": round(t_full * 1e3, 3),
            "optimizer_ms": round((t_full - t_grad) * 1e3, 3),
            "backward_ms": round((t_grad - t_loss) * 1e3, 3),
            "loss_assembly_ms": round((t_loss - t_sample) * 1e3, 3),
            "transport_ms": round((t_sample - t_bt) * 1e3, 3),
            "base_target_ms": round(t_bt * 1e3, 3),
            "made_fwd_ms": round(t_made * 1e3, 3),
            "made_serialization_ms": round((t_made - t_made_par) * 1e3, 3),
            "spline_fwd_ms": round(t_spline * 1e3, 3),
            "matmul_sol_ms": round(t_mm * 1e3, 3),
        }
    }, indent=None))


if __name__ == "__main__":
    main()
