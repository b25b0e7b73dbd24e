"""Second-round probe: where do the flagship backward's milliseconds go?

flagship_decomposition.py found forward transport at 77% MFU but backward
costing 7.2 ms where MADE parameter gradients alone explain only 2.7 ms.
This script pins the remainder:

  chain_grad_K     grad of the K-layer sampling transport (K = 1,3,6,12):
                   slope = per-layer backward cost in the REAL chained
                   topology, intercept = fixed overhead.
  isolated_grad    grad of sum_i flows[i].forward(z0) with z0 fixed — same
                   12 layers, no inter-layer dependency chain.
  identity_spline  chain grad with the elementwise spline replaced by
                   identity — isolates the spline's contribution to the
                   chained backward (cotangent modulation through z).
  first_pass_full  chain grad with the batch-1 first-pass optimization
                   DISABLED (full-batch first pass) — checks whether the
                   broadcast-sum cotangent is mispriced.

Same scan-chunked RTT-cancelled methodology as flagship_decomposition.py.

NOTE (post round-4): the identity_spline and first_pass_full probes
monkeypatch the GENERAL-path methods (MP._elementwise /
Autoregressive.inverse); the transposed fast path added in round 4
overrides forward/inverse in the NSF subclass and does not call either, so
on TPU those two probes now measure the unmodified chain (they were
decisive for the round-4 diagnosis when the general path was live — see
docs/performance.md).

Run:  env PYTHONPATH="/root/.axon_site:/root/repo" python examples/flagship_backward_probe.py
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

import normflows_tpu as nf
from normflows_tpu.utils import enable_compilation_cache

from flagship_decomposition import scan_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", type=int, default=40)
    ap.add_argument("--short", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test config (tiny model/N, 2-step scans)")
    args = ap.parse_args()
    enable_compilation_cache()

    import bench

    if args.tiny:
        model = bench.build_model(2, 32, num_bins=4)
        N = 2**8
        args.long, args.short = 2, 1
        chain_ks = (1, 2)
    else:
        model = bench.build_model()
        N = 2**14
        chain_ks = (1, 3, 6, 12)
    model = nf.utils.set_compute_dtype(model, "bfloat16")

    def report(name, sec, note=""):
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3),
                          "note": note}), flush=True)

    # ---- chained transport grad at K layers -------------------------------
    def chain_case(K):
        sub = model.replace(flows=model.flows[:K])
        diff, rest = nf.partition(sub)

        def body(c):
            diff, key = c
            key, k2 = jax.random.split(key)

            def f(d):
                z, log_q = nf.combine(d, rest).sample(k2, N)
                return jnp.mean(z) + jnp.mean(log_q)

            g = jax.grad(f)(diff)
            return jax.tree.map(lambda p, gg: p + 1e-30 * gg, diff, g), key

        return scan_time(body, (diff, jax.random.key(0)),
                         args.long, args.short)

    times = {}
    for K in chain_ks:
        times[K] = chain_case(K)
        report(f"chain_grad_K{K}", times[K])
    k_hi, k_lo = chain_ks[-1], chain_ks[0]
    slope = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    report("per_layer_chained", slope, f"slope K={k_lo}..{k_hi}")

    # ---- isolated layers (no chain) ---------------------------------------
    diff, rest = nf.partition(model)
    z0 = jax.random.normal(jax.random.key(2), (N, 2))

    def iso_body(c):
        diff, key = c
        key, k2 = jax.random.split(key)

        def f(d):
            m = nf.combine(d, rest)
            acc = jnp.float32(0)
            for fl in m.flows:
                z, ld = fl.forward(z0 + 1e-12 * jax.random.uniform(k2, ()), None)
                acc = acc + jnp.mean(z) + jnp.mean(ld)
            return acc

        g = jax.grad(f)(diff)
        return jax.tree.map(lambda p, gg: p + 1e-30 * gg, diff, g), key

    report("isolated_grad_12", scan_time(iso_body, (diff, jax.random.key(0)),
                                         args.long, args.short),
           "12 layers, shared z0, no chaining")

    # ---- identity spline in the chain -------------------------------------
    from normflows_tpu.flows.neural_spline.autoregressive import (
        MaskedPiecewiseRationalQuadraticAutoregressive as MP,
    )

    real_elem = MP._elementwise
    try:
        def ident(self, inputs, params, inverse):
            # consume params so MADE grads still flow (shape-matched scale)
            s = jnp.sum(params, axis=-1) * 1e-12
            return inputs * (1.0 + s.reshape(inputs.shape[0], -1)[:, :inputs.shape[1]]), \
                jnp.zeros(inputs.shape[0], inputs.dtype)

        MP._elementwise = ident

        def id_body(c):
            diff, key = c
            key, k2 = jax.random.split(key)

            def f(d):
                z, log_q = nf.combine(d, rest).sample(k2, N)
                return jnp.mean(z) + jnp.mean(log_q)

            g = jax.grad(f)(diff)
            return jax.tree.map(lambda p, gg: p + 1e-30 * gg, diff, g), key

        report("identity_spline_chain_grad",
               scan_time(id_body, (diff, jax.random.key(0)),
                         args.long, args.short),
               "12-layer chain grad, spline -> identity")
    finally:
        MP._elementwise = real_elem

    # ---- full-batch first pass (optimization disabled) --------------------
    from normflows_tpu.flows.affine import autoregressive as ar_mod

    real_inv = ar_mod.Autoregressive.inverse
    try:
        def inverse_fullpass(self, inputs, context=None, *, key=None):
            num_inputs = int(np.prod(inputs.shape[1:]))
            carry = (jnp.zeros_like(inputs), jnp.zeros(inputs.shape[0], inputs.dtype))
            for _ in range(num_inputs):
                params = self.autoregressive_net(carry[0], context)
                carry = self._elementwise_inverse(inputs, params)
            return carry

        ar_mod.Autoregressive.inverse = inverse_fullpass

        def fp_body(c):
            diff, key = c
            key, k2 = jax.random.split(key)

            def f(d):
                z, log_q = nf.combine(d, rest).sample(k2, N)
                return jnp.mean(z) + jnp.mean(log_q)

            g = jax.grad(f)(diff)
            return jax.tree.map(lambda p, gg: p + 1e-30 * gg, diff, g), key

        report("first_pass_fullbatch_chain_grad",
               scan_time(fp_body, (diff, jax.random.key(0)),
                         args.long, args.short),
               "batch-1 first-pass optimization disabled")
    finally:
        ar_mod.Autoregressive.inverse = real_inv


if __name__ == "__main__":
    main()
