"""Multi-process (2-process CPU) smoke test for parallel.distributed.

Launches two real OS processes that rendezvous via
``jax.distributed.initialize`` on a localhost coordinator, build a GLOBAL mesh
spanning both processes' virtual CPU devices, assemble a globally-sharded
array from per-process shards, and run a jitted global reduction — the exact
control flow a 2-host TPU pod uses (SURVEY.md §2.7 multi-host row), minus the
DCN. Skips where sockets are unavailable."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    import numpy as np
    import jax

    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from normflows_tpu import parallel
    from jax.sharding import NamedSharding, PartitionSpec as P

    parallel.initialize_distributed(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nproc  # global view spans both processes

    # per-host data loading helpers
    assert parallel.process_local_batch(32) == 32 // nproc
    assert parallel.local_device_batch(32) == 32 // nproc // 2

    # global mesh over all processes' devices; each process contributes its
    # local shard of the batch (rows valued pid+1), then a jitted global sum
    # runs as one SPMD program across processes.
    mesh = parallel.make_mesh()
    rows = 16 // nproc
    x_local = np.full((rows, 2), float(pid + 1), np.float32)
    ga = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local, (16, 2)
    )
    total = jax.jit(lambda a: a.sum())(ga)
    expected = 2.0 * rows * sum(range(1, nproc + 1))  # 48 for nproc=2
    assert abs(float(total) - expected) < 1e-5, float(total)
    print("DISTOK", pid, flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("sockets unavailable")
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    addr = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", addr],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DISTOK {i}" in out


def test_explicit_coordinator_errors_propagate(monkeypatch):
    """With explicit args, a failed init must raise, not silently degrade to
    single-process (the auto-detect path may swallow; the explicit path must
    not)."""
    import jax

    from normflows_tpu import parallel

    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        parallel.initialize_distributed(
            coordinator_address="127.0.0.1:1", num_processes=2, process_id=0
        )
    # auto-detect path stays forgiving
    parallel.initialize_distributed()


CKPT_WORKER = textwrap.dedent(
    """
    import sys
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    pid, nproc, addr, phase, ckpt = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
    )

    import normflows_tpu as nf
    from normflows_tpu import flows, distributions, parallel
    from normflows_tpu.training import save_checkpoint, restore_checkpoint
    from jax.sharding import NamedSharding, PartitionSpec as P

    parallel.initialize_distributed(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    mesh = parallel.make_mesh()

    def build_model():
        layers = []
        for i in range(4):
            from normflows_tpu.nets import MLP
            mlp = MLP.create(jax.random.key(100 + i), [2, 32, 32, 2],
                             leaky=0.01, init_zeros=True)
            b = jnp.array([(i + j) % 2 for j in range(2)], jnp.float32)
            layers.append(flows.MaskedAffineFlow.create(b, t=mlp,
                s=MLP.create(jax.random.key(200 + i), [2, 32, 32, 2],
                             leaky=0.01, init_zeros=True)))
        return nf.NormalizingFlow.create(
            distributions.DiagGaussian.create(2), layers)

    model = build_model()
    opt = optax.adam(1e-3)
    step_fn, diff, rest, opt_state = parallel.make_data_parallel_step(
        model, opt, lambda m, b, k: m.forward_kld(b), mesh, donate=False)

    rng = np.random.default_rng(7)
    batches = rng.normal(size=(4, 16, 2)).astype(np.float32)  # deterministic
    rows = 16 // nproc

    def global_batch(i):
        local = batches[i][pid * rows : (pid + 1) * rows]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local, (16, 2))

    key = jax.random.key(0)
    if phase == "full":
        for i in range(2):
            diff, opt_state, loss = step_fn(diff, opt_state, global_batch(i), key)
        save_checkpoint(ckpt, (diff, opt_state))
    else:
        diff, opt_state = restore_checkpoint(ckpt, (diff, opt_state))
    tail = []
    for i in (2, 3):
        diff, opt_state, loss = step_fn(diff, opt_state, global_batch(i), key)
        tail.append(float(loss))
    print("CKPTLOSS", pid, repr(tail), flush=True)
    """
)


def _run_two_procs(script_path, extra_args, timeout=300):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), str(i), "2", addr] + extra_args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


def test_two_process_checkpoint_save_restore_resume(tmp_path):
    """SURVEY §5 multi-host restartability: train 2 steps sharded across two
    real processes, orbax-save, restart a FRESH 2-process cluster, restore,
    resume — the resumed loss trajectory must equal the uninterrupted run's
    exactly (reference save/load surface: core.py:199-213)."""
    worker = tmp_path / "ckpt_worker.py"
    worker.write_text(CKPT_WORKER)
    ckpt = str(tmp_path / "ckpt")

    def tail_losses(outs):
        vals = []
        for out in outs:
            for line in out.splitlines():
                if line.startswith("CKPTLOSS"):
                    vals.append(eval(line.split(" ", 2)[2]))
        assert len(vals) == 2, outs
        # both processes observe the same global loss
        assert vals[0] == pytest.approx(vals[1], abs=1e-6)
        return vals[0]

    full = tail_losses(_run_two_procs(worker, ["full", ckpt]))
    resumed = tail_losses(_run_two_procs(worker, ["resume", ckpt]))
    assert resumed == pytest.approx(full, abs=1e-6), (full, resumed)
