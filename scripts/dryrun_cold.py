"""Cold-compile dryrun_multichip with SPMD-warning assertion (VERDICT r4 item 5).

The persistent `.jax_cache/` means XLA's `spmd_partitioner` warnings (e.g.
involuntary full rematerialization) only print on FRESH compiles, so a
cache hit can mask a sharding regression. This runner points the cache at
a brand-new empty directory, captures Python-side logging AND the XLA/TSL
stderr stream (fd 2 — absl logs bypass sys.stderr), runs the full
`dryrun_multichip(n)` composition suite, and fails if any spmd_partitioner
line was emitted.

    python scripts/dryrun_cold.py [--n 8] [--keep-log PATH]

Expect ~30-60 min on this 1-core host (every composition compiles fresh).
"""

import argparse
import os
import sys
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--keep-log", default="",
                    help="also copy the captured stderr to this path")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    cold_dir = tempfile.mkdtemp(prefix="aat_cold_jax_cache_")
    os.environ["AAT_TPU_CACHE_DIR"] = cold_dir
    # the virtual CPU mesh (no real multi-chip here); set before jax imports
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.n}")
    os.environ["JAX_PLATFORMS"] = "cpu"

    # capture fd 2: absl/TSL C++ logging (where spmd_partitioner.cc warnings
    # land) writes straight to the file descriptor, not sys.stderr
    log_path = os.path.join(cold_dir, "stderr.log")
    log_fd = os.open(log_path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    saved = os.dup(2)
    os.dup2(log_fd, 2)
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(args.n)
    finally:
        os.dup2(saved, 2)
        os.close(saved)
        os.close(log_fd)

    with open(log_path) as f:
        stderr_text = f.read()
    sys.stderr.write(stderr_text)
    if args.keep_log:
        with open(args.keep_log, "w") as f:
            f.write(stderr_text)
    bad = [ln for ln in stderr_text.splitlines()
           if "spmd_partitioner" in ln.lower()
           or "rematerializ" in ln.lower()]
    assert not bad, "SPMD warnings on cold compile:\n" + "\n".join(bad)
    print(f"COLD dryrun_multichip({args.n}) clean: no spmd_partitioner/"
          f"rematerialization warnings on fresh compiles "
          f"(cache dir {cold_dir}, stderr {len(stderr_text)} bytes)")


if __name__ == "__main__":
    main()
