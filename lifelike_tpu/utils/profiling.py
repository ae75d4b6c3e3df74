"""Tracing, honest latency measurement, and speed-of-light accounting.

The reference has no profiling subsystem at all — its closest artifacts are
actor-side FPS logging (reference learning/actors/distill_actor.py:172-176)
and the real-time sleep throttle in the PMC env (reference
primitive_level_env.py:241-244). A TPU framework whose north-star metric is
kernel latency needs first-class observability instead:

- `trace(logdir)`: xprof-compatible device traces via jax.profiler.
- `annotate(name)`: named regions that show up on the trace timeline.
- `cost_analysis(fn, *args)`: XLA's own FLOP / byte accounting for a jitted
  callable (what the compiler thinks the program costs).
- `speed_of_light(...)`: roofline accounting — given the compiled cost and
  the chip's peak FLOP/s and HBM bandwidth, the minimum possible runtime and
  which resource bounds it; paired with a measured time it yields the
  achieved fraction of speed-of-light.
- `chained_latency(step, state)`: honest per-call device latency. Single
  `block_until_ready` wall times include the host<->device round trip (which
  on a tunneled single-chip setup dwarfs small kernels), so we time M
  data-dependent iterations inside ONE jitted program for two values of M
  and report the slope — the same receding-horizon pattern bench.py uses.
"""
import contextlib
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ChipSpec(NamedTuple):
    name: str
    peak_flops_f32: float  # FLOP/s (MXU matmul peak)
    peak_flops_bf16: float
    hbm_bytes_per_s: float
    vmem_bytes: float
    # ESTIMATED elementwise VPU throughput: (8, 128) vector lanes x ~4 ALU
    # ops/cycle x clock, per TensorCore. The right roofline for scalar-heavy
    # kernels (the physics has no matmuls, so the MXU peak is irrelevant).
    vpu_flops: float = 4e12


# Public per-chip peaks (jax-ml.github.io/scaling-book, Google Cloud TPU docs).
CHIP_SPECS = {
    "TPU v4": ChipSpec("TPU v4", 1.375e14, 2.75e14, 1.23e12, 128 * 2**20,
                       4.3e12),
    "TPU v5e": ChipSpec("TPU v5e", 0.985e14, 1.97e14, 8.1e11, 128 * 2**20,
                        3.9e12),
    "TPU v5p": ChipSpec("TPU v5p", 2.295e14, 4.59e14, 2.765e12, 128 * 2**20,
                        7.3e12),
    "TPU v6e": ChipSpec("TPU v6e", 4.585e14, 9.17e14, 1.64e12, 128 * 2**20,
                        7.6e12),
}
_FALLBACK = ChipSpec("unknown", 1e12, 2e12, 1e11, 16 * 2**20, 1e12)


def detect_chip(device=None) -> ChipSpec:
    """Best-effort ChipSpec for a jax device (exact-name or substring match)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    if kind in CHIP_SPECS:
        return CHIP_SPECS[kind]
    k = kind.lower()
    # device_kind strings vary: 'TPU v5 lite' == v5e, 'TPU v5' == v5p
    if "v5 lite" in k or "v5lite" in k or "v5e" in k:
        return CHIP_SPECS["TPU v5e"]
    for name, spec in CHIP_SPECS.items():
        tail = name.split()[-1]  # 'v5e' etc.
        if tail in k:
            return spec
    return _FALLBACK._replace(name=kind or "unknown")


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture an xprof/perfetto-compatible device trace into `logdir`."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the trace timeline (and in HLO metadata under jit)."""
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA cost analysis of jit(fn)(*args): {'flops', 'bytes accessed', ...}.

    Returns {} if the backend offers no analysis (some interpret modes)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if ca is None:
        return {}
    return dict(ca[0] if isinstance(ca, (list, tuple)) else ca)


class SolReport(NamedTuple):
    flops: float
    bytes_accessed: float
    t_compute_s: float  # FLOP-bound lower bound
    t_memory_s: float  # HBM-bound lower bound
    sol_s: float  # max of the two: the speed-of-light runtime
    bound: str  # 'compute' | 'memory'
    arithmetic_intensity: float  # FLOP / byte
    measured_s: Optional[float]
    achieved_fraction: Optional[float]  # sol_s / measured_s (1.0 = at SoL)
    chip: str


def speed_of_light(
    fn=None,
    *args,
    flops: Optional[float] = None,
    bytes_accessed: Optional[float] = None,
    spec: Optional[ChipSpec] = None,
    measured_s: Optional[float] = None,
    dtype_peak: str = "f32",
) -> SolReport:
    """Roofline report for a jitted callable (or explicit flops/bytes).

    Either pass `fn, *args` (costs come from XLA's cost model) or explicit
    `flops=`/`bytes_accessed=` from an analytic count."""
    if fn is not None:
        ca = cost_analysis(fn, *args)
        flops = float(ca.get("flops", 0.0)) if flops is None else flops
        if bytes_accessed is None:
            bytes_accessed = float(ca.get("bytes accessed", 0.0))
    assert flops is not None and bytes_accessed is not None
    spec = spec or detect_chip()
    peak = spec.peak_flops_bf16 if dtype_peak == "bf16" else spec.peak_flops_f32
    t_c = flops / peak
    t_m = bytes_accessed / spec.hbm_bytes_per_s
    sol = max(t_c, t_m)
    return SolReport(
        flops=flops,
        bytes_accessed=bytes_accessed,
        t_compute_s=t_c,
        t_memory_s=t_m,
        sol_s=sol,
        bound="compute" if t_c >= t_m else "memory",
        arithmetic_intensity=flops / max(bytes_accessed, 1.0),
        measured_s=measured_s,
        achieved_fraction=(sol / measured_s) if measured_s else None,
        chip=spec.name,
    )


def chained_latency(step, state, m_lo: int = 2, m_hi: int = 8, reps: int = 3):
    """Per-call device latency of `state -> state`, RTT excluded.

    Jits `fori_loop(0, M, step)` for M = m_lo and m_hi; the slope
    (t_hi - t_lo) / (m_hi - m_lo) is the pure per-iteration device time.
    `step` must be data-dependent iteration-to-iteration (state flows
    through), or XLA could overlap iterations."""

    def runner(m):
        f = jax.jit(
            lambda s: jax.lax.fori_loop(0, m, lambda _, x: step(x), s)
        )
        out = f(state)  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(state))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = runner(m_lo), runner(m_hi)
    return max(t_hi - t_lo, 0.0) / (m_hi - m_lo)


def format_report(r: SolReport) -> str:
    lines = [
        f"chip {r.chip}: {r.flops:.3e} FLOP, {r.bytes_accessed:.3e} B "
        f"(AI {r.arithmetic_intensity:.1f} FLOP/B)",
        f"speed of light {r.sol_s * 1e3:.3f} ms ({r.bound}-bound; "
        f"compute {r.t_compute_s * 1e3:.3f} ms / memory {r.t_memory_s * 1e3:.3f} ms)",
    ]
    if r.measured_s is not None:
        lines.append(
            f"measured {r.measured_s * 1e3:.3f} ms = "
            f"{100.0 * r.achieved_fraction:.1f}% of speed of light"
        )
    return "\n".join(lines)
