"""Worker entry for the 2-process jax.distributed parity test.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port> <out.json>

Each worker exposes 2 virtual CPU devices, joins the gloo-backed cluster,
builds the GLOBAL (2 procs x 2 devices) dp mesh, runs tests/_mp_case.run_case
on it, and writes its loss trajectory + parameter fingerprint as JSON.
"""
import json
import os
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    # 2 local virtual devices per process; strip any inherited force-count
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")  # sandbox pins an accelerator

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root
    sys.path.insert(0, here)                   # tests/ for _mp_case

    from rrtmil_tpu.parallel.mesh import initialize_multiprocess, make_mesh

    initialize_multiprocess(f"127.0.0.1:{port}", num_processes=nproc,
                            process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    from _mp_case import run_case

    mesh = make_mesh(dp=2 * nproc, sp=1)
    losses, fingerprint = run_case(mesh)
    with open(out_path, "w") as f:
        json.dump({"process_id": pid, "losses": losses,
                   "fingerprint": fingerprint}, f)
    print(f"worker {pid} done: {losses}", flush=True)


if __name__ == "__main__":
    main()
