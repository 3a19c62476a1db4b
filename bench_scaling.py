#!/usr/bin/env python
"""Scaling-efficiency harness for the sharded fused detection path.

BASELINE.md's third target -- >=90 % samples/s scaling efficiency at
1 chip -> 1 host -> N>=2 hosts -- cannot be measured end-to-end on this
image (one real chip through the axon tunnel), so this harness makes the
claim falsifiable from three measurable sides.  As of round 3 every side
runs the FLAGSHIP time-major kernel (`pallas_minn_tm`), the same kernel
bench.py's headline quotes -- no kernel mixing:

  (a) REAL CHIP: `sharded_minn_rtl_detect_fused_tm` on a mesh(1,1) vs the
      unsharded TM fused kernel -- bounds the shard_map + collective-stitch
      overhead that every multi-chip config pays per chip.
  (b) 8-DEVICE CPU MESH (subprocess): runs the same sharded TM path on
      (data,seq) = (8,1), (2,4), (1,8); asserts event-table equality to
      the unsharded TM kernel; counts the ACTUAL collectives per dispatch
      from the compiled HLO; verifies the int16-on-the-wire halo path is
      bit-identical; reports halo bytes per shard for both dtypes.
  (c) PROJECTION: combines the measured single-chip rate (bench.py), the
      counted collectives, and public ICI/DCN bandwidth assumptions into
      projected weak/strong-scaling efficiencies for 8 chips and 2 hosts,
      for both f32 and int16 (production ADC ingest) halos.

Round 5 adds (d) STRUCTURE: a taint analysis of the traced (1,8) sharded
program asserting the interior fused-TM pallas_call has NO dependence path
from the halo ppermute -- the property the overlap projection rests on.

Writes SCALING_r05.json and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

Q = 512
SMOOTH_SHIFT = 3
HYST = 2
KW = dict(
    quarter_len=Q, smooth_shift=SMOOTH_SHIFT,
    threshold_value=int(0.10 * (1 << 15)),
    threshold_frac_bits=15, hysteresis=HYST,
)
C = 4          # 2 RX branches x (I, Q) planar channel rows
ROWS = 8192    # TM kernel rows per grid step (the bench.py headline shape)
LANES = 128

# Conservative public bandwidth assumptions (bytes/s); the projection
# reports its own inputs so the assumption is auditable.
ICI_BW = 45e9    # v5e ICI per link-direction, ~50 GB/s class
DCN_BW = 6.25e9  # 50 Gbps host NIC
COLL_LAT_ICI = 2e-6
COLL_LAT_DCN = 50e-6
SINGLE_CHIP_SPS = 17.07e9  # bench.py driver-captured TM rate (BENCH_r04.json)


def _halo_width() -> int:
    from ofdm_sync_tpu.parallel.shard import _minn_halo_width

    return _minn_halo_width(Q, SMOOTH_SHIFT, max(HYST, 1))


def _count_collectives(lowered_text: str) -> dict:
    return {
        "collective_permute": lowered_text.count("collective-permute"),
        "all_gather": lowered_text.count("all-gather"),
        "all_reduce": lowered_text.count("all-reduce"),
        "reduce_scatter": lowered_text.count("reduce-scatter"),
    }


def _overlap_structure(closed_jaxpr) -> dict:
    """Structural check of the overlap schedule FROM THE TRACED PROGRAM:
    inside the shard_map body, exactly one of the two fused-TM
    `pallas_call`s (the 1-block remote-halo call) may transitively depend
    on the halo `ppermute`; the interior call must not.  Data dependence is
    the property XLA's latency-hiding scheduler preserves -- an interior
    call with no path from the ppermute is schedulable concurrently with
    the transfer, which is the whole overlap claim (round-4 VERDICT item 2
    asked for this to be asserted structurally, not just by formula)."""
    stats = {"ppermute": 0, "pallas_total": 0, "pallas_tainted": 0}

    def is_jaxpr(p):
        return hasattr(p, "eqns") or (
            hasattr(p, "jaxpr") and hasattr(p.jaxpr, "eqns")
        )

    def walk(jaxpr, tainted_in):
        jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
        tainted = set(tainted_in)

        def tin(v):
            return (not hasattr(v, "val")) and v in tainted

        for eqn in jaxpr.eqns:
            any_tin = any(tin(v) for v in eqn.invars)
            name = eqn.primitive.name
            if name == "ppermute":
                stats["ppermute"] += 1
                tainted.update(eqn.outvars)
                continue
            if name == "pallas_call":
                stats["pallas_total"] += 1
                if any_tin:
                    stats["pallas_tainted"] += 1
            for p in eqn.params.values():
                for sub in (p if isinstance(p, (list, tuple)) else (p,)):
                    if is_jaxpr(sub):
                        subj = getattr(sub, "jaxpr", sub)
                        # conservative positional taint hand-off: invars of
                        # the sub-jaxpr inherit the parent's taint status
                        sub_tainted = {
                            iv
                            for iv, ov in zip(subj.invars, eqn.invars)
                            if tin(ov)
                        } if len(subj.invars) == len(eqn.invars) else (
                            set(subj.invars) if any_tin else set()
                        )
                        walk(subj, sub_tainted)
            if any_tin:
                tainted.update(eqn.outvars)

    # descend to the shard_map body (the mesh program), then analyze
    top = closed_jaxpr.jaxpr
    body = None
    stack = [top]
    while stack:
        j = stack.pop()
        for eqn in j.eqns:
            if eqn.primitive.name == "shard_map":
                body = eqn.params.get("jaxpr")
            else:
                for p in eqn.params.values():
                    for sub in (p if isinstance(p, (list, tuple)) else (p,)):
                        if is_jaxpr(sub):
                            stack.append(getattr(sub, "jaxpr", sub))
        if body is not None:
            break
    if body is None:
        return {"error": "no shard_map eqn found", **stats}
    walk(body, set())
    ok = (
        stats["ppermute"] >= 1
        and stats["pallas_total"] >= 2
        and stats["pallas_tainted"] == 1
    )
    return {
        "interior_kernel_independent_of_halo_ppermute": ok,
        **stats,
    }


def part_real_chip() -> dict:
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_minn_tm import minn_rtl_detect_fused_tm
    from ofdm_sync_tpu.parallel.shard import (
        make_stream_mesh, sharded_minn_rtl_detect_fused_tm,
    )

    batch, L = 512, 1 << 18          # the bench.py headline workload (2 GB
    G, NT = batch // LANES, L // ROWS  # dispatches amortize tunnel latency)
    x = jax.jit(
        lambda k: jax.random.normal(k, (G, NT, C * ROWS, LANES), jnp.float32)
    )(jax.random.key(0))
    x.block_until_ready()
    mesh = make_stream_mesh(1, 1, devices=np.asarray(jax.devices()[:1]))

    base = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v.reshape(G * NT, C * ROWS, LANES), **KW,
            rows=ROWS, stream_len=L, batch=batch,
        ).count
    )
    shrd = jax.jit(
        lambda v: sharded_minn_rtl_detect_fused_tm(
            v, mesh, **KW, stream_len=L, rows=ROWS, batch=batch,
        ).count
    )

    def window(fn, iters=4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        int(np.asarray(out).sum())
        return batch * L * iters / (time.perf_counter() - t0)

    # warm both, then INTERLEAVE the A/B windows (the tunnel has slow/fast
    # phases ~2x apart; sequential groups would bias the ratio)
    int(np.asarray(base(x)).sum())
    int(np.asarray(shrd(x)).sum())
    sps_base = sps_shrd = 0.0
    for _ in range(3):
        sps_base = max(sps_base, window(base))
        sps_shrd = max(sps_shrd, window(shrd))
    return {
        "platform": "tpu",
        "kernel": "pallas_minn_tm (flagship time-major)",
        "workload": {"batch": batch, "stream_len": L},
        "unsharded_samples_per_sec": round(sps_base),
        "sharded_mesh11_samples_per_sec": round(sps_shrd),
        "shard_overhead_ratio": round(sps_base / sps_shrd, 4),
    }


def part_cpu_mesh() -> dict:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_minn_tm import minn_rtl_detect_fused_tm
    from ofdm_sync_tpu.parallel.shard import (
        _minn_halo_width, make_stream_mesh, sharded_minn_rtl_detect_fused_tm,
    )

    assert len(jax.devices()) == 8
    # small Q keeps interpret-mode cost down; same code path as Q=512
    q = 32
    kw = dict(KW, quarter_len=q)
    W = _minn_halo_width(q, SMOOTH_SHIFT, max(HYST, 1))
    rows = 512
    assert W <= rows
    G, NT = 8, 8
    L = NT * rows
    rng = np.random.default_rng(0)
    x = rng.standard_normal((G, NT, C * rows, LANES)).astype(np.float32)
    # plant a preamble straddling the seam between seq shards 3|4 of the
    # (1,8) mesh on stream 0 of group 0 (lane 0)
    A = rng.standard_normal(q) + 1j * rng.standard_normal(q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    p = 4 * rows - 2 * q        # starts in shard 3, peaks past the seam
    flat_i = np.zeros(L, np.float32)
    flat_q = np.zeros(L, np.float32)
    flat_i[p : p + 5 * q] = 3 * pre.real
    flat_q[p : p + 5 * q] = 3 * pre.imag
    # scatter into the tiled layout: sample t*rows+r of lane s lives at
    # x[g, t, c*rows + r, s]
    for c, flat in ((0, flat_i), (1, flat_q)):
        x[0, :, c * rows : (c + 1) * rows, 0] += flat.reshape(NT, rows)
    xj = jnp.asarray(x)

    # unsharded TM oracle (interpret mode on CPU)
    ref = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v.reshape(G * NT, C * rows, LANES), **kw,
            rows=rows, stream_len=L, batch=G * LANES, interpret=True,
        )
    )(xj)

    def tables_equal(tab, oracle) -> bool:
        return all(
            np.array_equal(np.asarray(getattr(tab, f)),
                           np.asarray(getattr(oracle, f)))
            for f in ("count", "gate_start", "gate_close", "peak_idx")
        )

    out = {"meshes": {}, "halo_width_samples": W}
    for n_data, n_seq in ((8, 1), (2, 4), (1, 8)):
        mesh = make_stream_mesh(n_data, n_seq)
        fn = jax.jit(
            lambda v, mesh=mesh: sharded_minn_rtl_detect_fused_tm(
                v, mesh, **kw, stream_len=L, rows=rows, batch=G * LANES,
                interpret=True,
            )
        )
        tab = fn(xj)
        hlo = fn.lower(xj).compile().as_text()
        colls = _count_collectives(hlo)
        G_loc = G // n_data
        out["meshes"][f"data{n_data}xseq{n_seq}"] = {
            "events_equal_unsharded": bool(tables_equal(tab, ref)),
            "collectives_per_dispatch": colls,
            "halo_bytes_per_seq_shard_f32": (
                G_loc * C * W * LANES * 4 if n_seq > 1 else 0
            ),
            "halo_bytes_per_seq_shard_int16": (
                G_loc * C * W * LANES * 2 if n_seq > 1 else 0
            ),
        }

    # int16-on-the-wire halo path: production ADC samples are int12-in-int16;
    # the sharded path keeps the halo ppermute in int16 (half the DCN bytes)
    # and the kernel converts in VMEM -- results must be bit-identical to
    # running the same int16 data unsharded.
    xi16 = np.clip(np.round(x * 256.0), -2048, 2047).astype(np.int16)
    xi16j = jnp.asarray(xi16)
    ref16 = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v.reshape(G * NT, C * rows, LANES), **kw,
            rows=rows, stream_len=L, batch=G * LANES, interpret=True,
        )
    )(xi16j)
    mesh18 = make_stream_mesh(1, 8)
    tab16 = jax.jit(
        lambda v: sharded_minn_rtl_detect_fused_tm(
            v, mesh18, **kw, stream_len=L, rows=rows, batch=G * LANES,
            interpret=True,
        )
    )(xi16j)
    out["int16_halo_events_equal_unsharded"] = bool(
        tables_equal(tab16, ref16)
    )
    out["planted_seam_event_detected"] = bool(
        np.asarray(ref.count)[0] >= 1
    )

    # structural overlap check on a mesh with NT_loc >= 2 (the overlap
    # schedule's domain; on (1,8) NT_loc=1 and the halo is inherently
    # serial): the interior fused-TM pallas_call must have NO dependence
    # path from the halo ppermute (asserted from the traced program, not
    # the formula)
    mesh24 = make_stream_mesh(2, 4)
    jaxpr = jax.make_jaxpr(
        lambda v: sharded_minn_rtl_detect_fused_tm(
            v, mesh24, **kw, stream_len=L, rows=rows, batch=G * LANES,
            interpret=True, overlap_halo=True,
        )
    )(xj)
    out["overlap_structure"] = _overlap_structure(jaxpr)
    return out


def projection(cpu_part: dict, overhead_ratio: float = 1.05) -> dict:
    """Projected samples/s scaling efficiency from measured rate + counted
    communication + the measured per-chip shard overhead.

    * weak data:   more streams per added chip -- zero collectives.
    * weak seq:    each chip keeps the bench workload's per-chip stream
      length (the BASELINE "1 chip -> 1 host -> N hosts" shape): halo cost
      is fixed per dispatch, so efficiency is per-chip-overhead-bound.
    * strong seq:  one fixed super-stream split N ways -- halo fraction
      grows as shards shrink (reported for completeness; not the target's
      regime).

    Projected for BOTH halo dtypes: f32 (the float bench workload) and
    int16 (the production ADC ingest dtype -- the sharded TM path keeps
    int16 on the wire, verified bit-identical in part (b)), and for BOTH
    schedules:

    * serialized: halo ppermute -> kernel -> table all_gather, fully
      dependent (the pre-round-4 path; kept as the lower bound).
    * overlap (the shipping default, `overlap_halo=True`): only the
      1-block remote-halo kernel call depends on the ppermute, so the
      transfer hides behind the interior call's (NT_loc-1)/NT_loc of the
      compute (structural independence in the program; XLA's latency-
      hiding scheduler does the rest).  Exposed communication is the
      small packed table all_gather plus whatever halo time exceeds the
      interior compute:
        t = max(t_interior, t_halo) + t_block0 + t_gather
    """
    batch, L = 512, 1 << 18
    NT = L // ROWS      # time blocks per chip in the bench workload (32)
    # the PRODUCTION halo width (Q=512), NOT the CPU test's small-Q width
    W = _halo_width()
    t_comp = batch * L / SINGLE_CHIP_SPS

    # collective rounds counted from HLO for the (1,8) mesh: one halo
    # ppermute + ONE packed all_gather table merge (round 2 paid 3 rounds)
    m18 = cpu_part["meshes"]["data1xseq8"]["collectives_per_dispatch"]
    rounds = sum(m18.values())
    halo_elems = C * batch * W          # == G_loc * C * W * LANES
    E, K = 8, 1                         # packed-table all_gather payload
    gather_bytes = batch * ((4 + K) * E + 2) * 4

    def eff_serial(tc, bw, lat, bytes_per_elem):
        t_comm = halo_elems * bytes_per_elem / bw + rounds * lat
        return tc / (tc * overhead_ratio + t_comm)

    def eff_overlap(tc, bw, lat, bytes_per_elem, nt):
        t_halo = halo_elems * bytes_per_elem / bw + lat
        t_gather = gather_bytes / bw + lat
        t_int = tc * overhead_ratio * (nt - 1) / nt
        t_blk0 = tc * overhead_ratio / nt
        # clamp: a measured sub-1.0 mesh(1,1) overhead ratio (noise) can
        # push the projection past 1.0; efficiency is capped at 1
        return min(tc / (max(t_int, t_halo) + t_blk0 + t_gather), 1.0)

    def block(bytes_per_elem, eff, nt_weak=NT):
        def e(tc, bw, lat, nt):
            if eff is eff_serial:
                return round(eff_serial(tc, bw, lat, bytes_per_elem), 4)
            return round(eff_overlap(tc, bw, lat, bytes_per_elem, nt), 4)

        return {
            "weak_scaling_seq_8chip_ici": e(
                t_comp, ICI_BW, COLL_LAT_ICI, nt_weak
            ),
            "weak_scaling_seq_2host_dcn": e(
                t_comp, DCN_BW, COLL_LAT_DCN, nt_weak
            ),
            "strong_scaling_seq_8chip_ici": e(
                t_comp / 8, ICI_BW, COLL_LAT_ICI, max(nt_weak // 8, 1)
            ),
            "strong_scaling_seq_2host_dcn": e(
                t_comp / 2, DCN_BW, COLL_LAT_DCN, max(nt_weak // 2, 1)
            ),
        }

    return {
        "assumptions": {
            "kernel": "pallas_minn_tm (flagship; same kernel as bench.py)",
            "single_chip_samples_per_sec": SINGLE_CHIP_SPS,
            "measured_per_chip_shard_overhead_ratio": overhead_ratio,
            "ici_bw_bytes_per_sec": ICI_BW,
            "dcn_bw_bytes_per_sec": DCN_BW,
            "collective_latency_ici_s": COLL_LAT_ICI,
            "collective_latency_dcn_s": COLL_LAT_DCN,
            "collective_rounds_per_dispatch": rounds,
            "halo_width_samples": W,
            "halo_bytes_per_seq_shard_f32": halo_elems * 4,
            "halo_bytes_per_seq_shard_int16": halo_elems * 2,
            "table_allgather_bytes_per_shard": gather_bytes,
            "time_blocks_per_chip": NT,
        },
        "weak_scaling_data_parallel": {
            # no cross-stream communication in the detection path at all
            # (events are per-stream; HLO shows 0 collectives on data-only
            # meshes) -- efficiency is bounded by dispatch skew only
            "efficiency_8chip": 1.0,
            "efficiency_2host": 1.0,
        },
        "halo_f32": block(4, eff_overlap),
        "halo_int16": block(2, eff_overlap),
        "halo_f32_serialized": block(4, eff_serial),
        "halo_int16_serialized": block(2, eff_serial),
    }


def main() -> None:
    role = os.environ.get("OFDM_SCALING_ROLE", "")
    if role == "cpu8":
        print(json.dumps(part_cpu_mesh()))
        return

    out_path = Path(__file__).parent / "SCALING_r05.json"
    cpu_part = None
    if os.environ.get("OFDM_SCALING_REUSE_CPU") == "1" and out_path.exists():
        # reuse the committed CPU-mesh equality/HLO results (they are
        # deterministic); only re-measure the real chip + projections
        cpu_part = json.loads(out_path.read_text()).get("cpu_mesh")
    if cpu_part is None:
        # subprocess for the CPU-mesh part (device count must be set pre-init)
        env = dict(os.environ, OFDM_SCALING_ROLE="cpu8")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            timeout=3600,
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print("cpu8 subprocess failed:", proc.stdout[-2000:],
                  proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(1)
        cpu_part = json.loads(lines[-1])

    result = {"cpu_mesh": cpu_part}
    real_prev = None
    if os.environ.get("OFDM_SCALING_REUSE_REAL") == "1" and out_path.exists():
        real_prev = json.loads(out_path.read_text()).get("real_chip")
    if real_prev and "shard_overhead_ratio" in real_prev:
        result["real_chip"] = real_prev
    else:
        try:
            import jax

            if jax.devices()[0].platform == "tpu":
                result["real_chip"] = part_real_chip()
        except Exception as e:  # pragma: no cover
            result["real_chip"] = {"error": f"{type(e).__name__}: {e}"}
    overhead = result.get("real_chip", {}).get("shard_overhead_ratio", 1.05)
    result["projection"] = projection(cpu_part, overhead_ratio=overhead)

    out_path.write_text(json.dumps(result, indent=1))
    proj = result["projection"]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "weak_data_8chip": proj["weak_scaling_data_parallel"][
            "efficiency_8chip"
        ],
        "weak_seq_8chip_ici_f32": proj["halo_f32"]["weak_scaling_seq_8chip_ici"],
        "weak_seq_2host_dcn_f32": proj["halo_f32"]["weak_scaling_seq_2host_dcn"],
        "weak_seq_2host_dcn_int16": proj["halo_int16"][
            "weak_scaling_seq_2host_dcn"
        ],
        "mesh11_overhead_ratio": result.get("real_chip", {}).get(
            "shard_overhead_ratio"
        ),
        "overlap_structural_independence": cpu_part.get(
            "overlap_structure", {}
        ).get("interior_kernel_independent_of_halo_ppermute"),
    }))


if __name__ == "__main__":
    main()
