"""Shared property-test harness, modeled on the reference's FlowTest /
DistributionTest (normflows/flows/flow_test.py:7-48,
normflows/distributions/distribution_test.py:6-51)."""

import jax
import jax.numpy as jnp
import numpy as np


def assert_close(a, b, atol=1e-4, rtol=1e-4, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol,
                               err_msg=msg)


def check_forward(flow, inputs, context=None, key=None):
    outputs, log_det = flow.forward(inputs, context, key=key)
    assert outputs.shape == inputs.shape, f"shape {outputs.shape} != {inputs.shape}"
    assert outputs.dtype == inputs.dtype
    assert log_det.shape == (inputs.shape[0],)
    return outputs, log_det


def check_inverse(flow, inputs, context=None, key=None):
    outputs, log_det = flow.inverse(inputs, context, key=key)
    assert outputs.shape == inputs.shape
    assert outputs.dtype == inputs.dtype
    assert log_det.shape == (inputs.shape[0],)
    return outputs, log_det


def check_forward_inverse(flow, inputs, context=None, atol=1e-4, rtol=1e-4):
    """Round-trip identity + log-det antisymmetry (flow_test.py:40-48)."""
    out, ld_fwd = check_forward(flow, inputs, context)
    recon, ld_inv = check_inverse(flow, out, context)
    assert_close(recon, inputs, atol=atol, rtol=rtol, msg="inverse(forward(z)) != z")
    assert_close(ld_fwd + ld_inv, jnp.zeros_like(ld_fwd), atol=atol, rtol=rtol,
                 msg="log_det_fwd + log_det_inv != 0")


def check_inverse_forward(flow, inputs, context=None, atol=1e-4, rtol=1e-4):
    out, ld_inv = check_inverse(flow, inputs, context)
    recon, ld_fwd = check_forward(flow, out, context)
    assert_close(recon, inputs, atol=atol, rtol=rtol, msg="forward(inverse(z)) != z")
    assert_close(ld_fwd + ld_inv, jnp.zeros_like(ld_fwd), atol=atol, rtol=rtol)


def check_dist(dist, num_samples=4, context=None, key=None, event_shape=None):
    """Sample/log_prob shape+dtype contract (distribution_test.py:6-51)."""
    if key is None:
        key = jax.random.key(0)
    z, log_p = dist.sample_and_log_prob(key, num_samples, context)
    assert z.shape[0] == num_samples
    assert log_p.shape == (num_samples,)
    if event_shape is not None:
        assert z.shape[1:] == tuple(event_shape)
    log_p2 = dist.log_prob(z, context)
    assert log_p2.shape == (num_samples,)
    return z, log_p, log_p2
