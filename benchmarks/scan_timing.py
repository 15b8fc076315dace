"""RTT-immune same-process kernel timing for the degraded axon tunnel.

The tunnel's fetch round-trip is non-stationary (measured 35 ms in some
sessions, 330-420 ms drifting by ~100 ms between samples in others), so
``wall - rtt`` corrections go negative. This module times a LONG chained
``lax.scan`` and a SHORT one back to back and differences them: the RTT
and dispatch overheads cancel, leaving (iters_hi - iters_lo) serialized
kernel applications. Inputs chain between measurements (each run consumes
the previous run's output) so a raced/stale fetch can never masquerade as
a completed run.

Usage:
    from scan_timing import scan_time_diff
    dt = scan_time_diff(fn, x)   # seconds per application of fn
"""

import time

import jax


def scan_time_diff(fn, x, iters_hi=220, iters_lo=20, pairs=3, consts=()):
    """Median over ``pairs`` of (wall_hi - wall_lo) / (iters_hi - iters_lo).

    ``fn(x, *consts)`` must map x -> same shape/dtype (the scan carry), and
    its output must depend on its input (serializes iterations on device).
    Device-resident operands go in ``consts`` — captured jnp arrays would be
    inlined as jit constants, which round-trips them through the host.
    """

    def make(iters):
        def run(x, *cs):
            def step(carry, _):
                return fn(carry, *cs), None

            return jax.lax.scan(step, x, None, length=iters)[0]

        return jax.jit(run)

    run_hi = make(iters_hi)
    run_lo = make(iters_lo)

    # compile + warm both programs, chaining the carry
    x = run_lo(x, *consts)
    float(x.ravel()[0])
    x = run_hi(x, *consts)
    float(x.ravel()[0])

    samples = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        x = run_lo(x, *consts)
        float(x.ravel()[0])
        t1 = time.perf_counter()
        x = run_hi(x, *consts)
        float(x.ravel()[0])
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo))
    samples.sort()
    return samples[len(samples) // 2]
