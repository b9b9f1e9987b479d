"""Benchmark: OFDM+DUC throughput and LDPC decode throughput on real TPU.

Prints ONE JSON line. Primary metric (the BASELINE.json north star,
>= 1 Gsample/s aggregate OFDM modulation) stays {"metric", "value",
"unit", "vs_baseline"}; the second BASELINE.json metric — LDPC
codewords/s/chip at BLER parity (Zc=384 bgn=1, mixed-MS alpha=0.8
beta=0.3, L=32, batch-swept) — rides in "extra_metrics" on the same
line so the driver's single-line parse keeps working.

Timing methodology: on the axon (tunneled-TPU) platform,
Array.block_until_ready returns before the computation actually
finishes, so naive timing loops measure dispatch latency and
over-report by ~100-1000x (round-1 numbers had this bug). Every
measurement here chains each step's scalar output into the next
step's input (a real data dependency XLA cannot elide) and ends with
a device_get of a float32 scalar, which does synchronize.

Complex boundary: axon cannot transfer complex buffers host<->device
(a complex h2d even poisons the process's device channel), so the
OFDM input goes up via utils.host.to_device (float32 planes fused
on-device) and every fetched value is float32.

Throughput floor (trace-backed — out/duc_trace_r05.json, regenerable
with tools/duc_trace.py, is a per-op device-time table from a
jax.profiler trace of 8 warm chain steps): the chain is
DATA-MOVEMENT-limited, not FLOP-limited. The
round-3 "48 GFLOP GEMM floor" dissolved once the FIR+HB moved into one
Pallas kernel (ops/pallas_filters.py): the kernel itself is 0.78 ms of
the ~3.3 ms device step; the rest is the factored XLA IFFT (~0.7 ms),
the CP-insert concat pass (~0.4 ms), complex<->planar boundary fusions
(~0.3 ms), one residual XLA relayout copy (~0.4 ms), and ~0.6 ms fixed
axon per-dispatch latency. Alternatives measured and rejected this
round: FFT-domain overlap-save FIR = 5.2-6.6 ms for the FIR stage
alone vs 1.59 ms for the Pallas kernel (XLA's TPU FFT runs far below
MXU rate, so the ~8x FLOP reduction loses 3-4x in wall clock);
lower-MAC XLA GEMM formulations (small-L banded, one-GEMM im2col) all
ran SLOWER than the L=512 D=2 shifted-GEMM because this chip's
effective GEMM rate collapses at small tiles; radix-64 MXU IFFT was
already slower (2.2 ms) than the XLA FFT in r3.

vs_baseline for LDPC is measured against the reference decoder
(py5gphy/ldpc/nr_ldpc_decode.py:11) on this machine's CPU at the same
config; see _REF_LDPC_CW_PER_S provenance note.
"""
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache so repeat bench runs skip the
    multi-minute axon compiles (first warm run pays them once)."""
    import jax

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax: cache simply stays off

# Reference nr_decode_ldpc(Zc=384, bgn=1, L=32, mixed-MS 0.8/0.3) on
# this machine's CPU (2 vCPU), garbage LLRs (no early exit), getH
# cached and one warmup decode first: per-codeword time extrapolated
# from best-of-2 L=2 vs L=16 runs (per-iteration 2.578 s, setup 18 s
# -> 100.5 s per codeword at L=32). Measured 2026-08-21 by
# tools/ldpc_ref_timing.py; full evidence in
# out/ldpc_ref_cpu_timing.json.
_REF_LDPC_CW_PER_S = 0.009954  # codewords/s, reference @ L=32


def _chain_time(step, x0, n_iter=50, repeats=3):
    """step(x, c)->float32 scalar; returns best avg seconds per call.

    Each call's scalar feeds the next call's input (data dependency),
    and a device_get at the end synchronizes for real.

    n_iter=50: the axon tunnel adds a fixed ~30 ms sync/RPC cost per
    chain (measured: an empty jit step costs 3.0 ms/call in a 10-call
    chain but 0.65 ms/call in a 50-call chain), so short chains
    under-report steady-state throughput by ~3 ms/call. 50 calls
    amortize the sync while the data-dependency chain still prevents
    any overlap-based over-reporting.
    """
    import jax
    import jax.numpy as jnp

    c = step(x0, jnp.float32(0.0))
    jax.device_get(c)  # compile + sync
    best = float("inf")
    for _ in range(repeats):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            c = step(x0, c * 1e-30)
        jax.device_get(c)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_ofdm_duc(profile: dict | None = None):
    import jax
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops import ofdm, filters
    from python_5gtoolbox_tpu.utils import numerology as num

    scs, bw = 30, 100
    n_slots, nant = 64, 2  # 32 ms of carrier; large batch amortizes launch
    prb = num.carrier_prb_size(scs, bw)
    rng = np.random.default_rng(0)
    # antenna-major layout: td (ant, slots, T) -> (ant, slots*T) is a
    # free reshape; slot-major would insert a 63 MB HBM transpose
    # (~0.4 ms) between the OFDM and filter stages
    fd = (rng.normal(size=(nant, n_slots, 14, 12 * prb))
          + 1j * rng.normal(size=(nant, n_slots, 14, 12 * prb))
          ).astype(np.complex64)

    @jax.jit
    def step(fd_slots, c):
        out = filters.tx_lowphy_duc(fd_slots * (1.0 + c), scs, bw,
                                    int(3500e6), 245.76e6,
                                    as_planes="split")
        re, im = (out if isinstance(out, tuple)
                  else (out[:nant], out[nant:]))
        return jnp.abs(jax.lax.complex(re[0, -1], im[0, -1]))

    from python_5gtoolbox_tpu.utils.host import to_device

    oversample = int(round(245.76e6 / (num.fft_size(prb) * scs * 1000)))
    n_samp = n_slots * ofdm.slot_sample_count(scs, bw) * oversample * nant
    fdj = to_device(fd)
    dt = _chain_time(step, fdj)

    if profile is not None:
        # on-chip IQ parity spot-check (ADVICE r3: CPU golden tests
        # can't see TPU matmul-precision lowering): run the Pallas
        # bf16x3 filter pair on the chip against an f64 host upfirdn
        from scipy.signal import upfirdn
        tpar = 65536 * 2
        xs = (rng.normal(size=(1, tpar))
              + 1j * rng.normal(size=(1, tpar))).astype(np.complex64)
        fir_taps = filters.fir_coeff(scs, bw)
        hb_taps = filters.halfband_coeff()

        @jax.jit
        def fstep(v):
            return filters.hb_upsample2(filters.fir_same(v, fir_taps),
                                        hb_taps)

        yj = fstep(to_device(xs))
        y_chip = (np.asarray(jax.device_get(jnp.real(yj)))
                  + 1j * np.asarray(jax.device_get(jnp.imag(yj))))
        n1, n2 = len(fir_taps), len(hb_taps)
        yf = upfirdn(fir_taps, xs[0].astype(np.complex128)
                     )[n1 // 2: n1 // 2 + tpar]
        yref = upfirdn(hb_taps, yf, up=2)[n2 // 2 - 1:
                                          n2 // 2 - 1 + 2 * tpar] \
            * np.sqrt(2)
        parity_err = float(np.abs(y_chip[0] - yref).max())
        profile["onchip_filter_parity"] = {
            "max_abs_err_vs_f64_upfirdn": parity_err,
            "golden_tolerance": 2e-4,
            "ok": parity_err < 2e-4,
        }
        if parity_err >= 2e-4:
            # fail LOUDLY (ADVICE r4 finding 3): a silent ok=false would
            # let a kernel precision regression publish green throughput
            raise RuntimeError(
                f"PARITY FAIL: on-chip bf16x3 filter error {parity_err:g} "
                f">= 2e-4 vs f64 upfirdn — refusing to report throughput")

        # per-stage breakdown (VERDICT r2 item 10): time each pipeline
        # stage in isolation with the same chained methodology
        @jax.jit
        def step_ofdm(x, c):
            td = ofdm.tx_low_phy(x * (1.0 + c), scs, bw, int(3500e6), roll_ant=False)
            return jnp.abs(td[0, 0, -1])

        td = ofdm.tx_low_phy(fdj, scs, bw, int(3500e6), roll_ant=False)
        flat = jax.device_put(td.reshape(td.shape[0], -1))

        @jax.jit
        def step_fir(x, c):
            y = filters.fir_same(x * (1.0 + c), filters.fir_coeff(scs, bw))
            return jnp.abs(y[0, -1])

        @jax.jit
        def step_hb(x, c):
            y = filters.hb_upsample2(x * (1.0 + c))
            return jnp.abs(y[0, -1])

        from python_5gtoolbox_tpu.ops.pallas_filters import fir_up2_fused

        @jax.jit
        def step_fused(x, c):
            y = fir_up2_fused(x * (1.0 + c), filters.fir_coeff(scs, bw),
                              filters.halfband_coeff())
            return jnp.abs(jnp.real(y[0, -1]))

        t_o = _chain_time(step_ofdm, fdj)
        t_f = _chain_time(step_fir, flat)
        t_h = _chain_time(step_hb, flat)
        t_u = _chain_time(step_fused, flat)
        profile["ofdm_duc"] = {
            "full_chain_ms": round(dt * 1e3, 3),
            "stages_ms": {"ofdm_ifft_cp": round(t_o * 1e3, 3),
                          "fir_same_287tap_pallas": round(t_f * 1e3, 3),
                          "hb_upsample2_pallas": round(t_h * 1e3, 3),
                          "fir_hb_fused_pallas": round(t_u * 1e3, 3)},
            "note": "stage times measured in isolation each include "
                    "~0.6 ms chain-sync overhead; the full chain uses "
                    "the FUSED fir+hb kernel and the planar OFDM "
                    "output pass (ops/filters.py tx_lowphy_duc); see "
                    "out/duc_trace_r05.json for the per-op device "
                    "attribution without the sync smear",
            "config": f"scs{scs} bw{bw} slots{n_slots} ant{nant}",
        }
    return n_samp / dt / 1e6  # Msamples/s


def bench_ldpc(schedule="flooded", n_iter_dec=32, batches=(512, 2048),
               semantics="exact"):
    """Best codewords/s over a batch sweep at the BLER-parity config."""
    import jax
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    zc, bgn = 384, 1
    N = 66 * zc
    rng = np.random.default_rng(1)
    best = 0.0
    best_b = 0
    for B in batches:
        # garbage LLRs: nothing converges, so the masked early exit
        # never fires and the timing is the worst-case fixed-iteration
        # cost (real traffic is never slower than this)
        llr = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32) * 4.0)

        @jax.jit
        def step(x, c):
            bits = ldpc_decode(x + c, zc, bgn, n_iter_dec, "min-sum",
                               0.8, 0.3, schedule=schedule,
                               semantics=semantics)[0]
            return jnp.float32(bits.sum())

        dt = _chain_time(step, llr, n_iter=5)
        cw_s = B / dt
        if cw_s > best:
            best, best_b = cw_s, B
    return best, best_b


def bench_polar_scl(B=1024, K=164, E=512, L=8, n_max=9, i_il=1,
                    crc_len=24, rnti=0):
    """CA-SCL codewords/s (chunked impl). Default = DL scale (N=512);
    also benched: UL PUSCH-UCI scale (nMax=10, N=1024) and a PDCCH
    blind-decode batch with traced per-candidate RNTI masks
    (VERDICT r3 item 7)."""
    import jax
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops.polar.decode import polar_decode_scl

    rng = np.random.default_rng(2)
    llr = jnp.asarray((rng.normal(size=(B, E)) * 2).astype(np.float32))
    rnti_arg = (jnp.full((), rnti, jnp.int32) if np.isscalar(rnti)
                else jnp.asarray(rnti, jnp.int32))

    @jax.jit
    def step(x, c):
        ck, ok = polar_decode_scl(x + c, E, K, L, n_max, i_il, crc_len,
                                  0, rnti_arg)
        return jnp.float32(ck.sum()) + jnp.float32(ok.sum())

    dt = _chain_time(step, llr, n_iter=5)
    return B / dt


def bench_link_level():
    """End-to-end link-level PDSCH sweep (TX + fading channel + batched
    one-dispatch RX + LDPC decode) on the chip -> slots/s.

    The round-4 headline path: rx_process_batch + device-resident
    waveform/channel chain + software-pipelined SNR loop
    (out/tpu_vs_cpu_sim.json holds the CPU comparison)."""
    import numpy as np

    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.utils.config import get_default_config, merged
    from scripts.internal import sim_pdsch_throughput_internal as pdsim

    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=20, scs=30, num_of_ant=2, Nr=4,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=2, mcs_table="256QAM", num_of_layers=2,
                        rv=[0], data_source=[], StartSymbolIndex=2,
                        NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=20)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    pdsch["precoding_matrix"] = np.empty(0)
    chan = chan_mod.gen_channel_model_config(
        model_format="customized", Nt=2, Nr=4, fm_inHz=200,
        multi_paths=[[0, 0, "Rayleigh", 0, 0]])
    ce = dict(CE_algo="DFT", L_symm_left_in_ns=200,
              L_symm_right_in_ns=200, eRB=2, enable_TO_comp=True,
              enable_FO_est=False, enable_FO_comp=False)
    ldpc = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)
    snrs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    kw = dict(ceq_algo_list=["MMSE-IRC"], n_slots=20, ce_config=ce,
              ldpc_config=ldpc, seed=3)
    pdsim.run_pdsch_throughput(carrier, pdsch, chan, snrs, **kw)  # warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        pdsim.run_pdsch_throughput(carrier, pdsch, chan, snrs, **kw)
        best = max(best, len(snrs) * 20 / (time.perf_counter() - t0))
    return best


def bench_link_level_pusch_tp():
    """Transform-precoded (DFT-s-OFDM) UL sweep through the batched
    one-dispatch RX -> slots/s (VERDICT r4 item 3: the r5
    batched-RX transform-precoding path as a bench metric).

    Config mirrors tests/test_batch_rx.py::
    test_pusch_batch_transform_precoding (1 layer, NumCDM=2, MMSE-IRC;
    reference de-precode branch
    /root/reference/py5gphy/nr_pusch/nr_pusch.py:116-216) scaled up to
    BW20/20 slots like the DL sweep metric."""
    import numpy as np

    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.utils.config import get_default_config, merged
    from scripts.internal import sim_pusch_throughput_internal as pusim

    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=20, scs=30, num_of_ant=1, Nr=2,
                          maxMIMO_layers=1, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pusch = merged(get_default_config("pusch"),
                   dict(mcs_table="MCStable61411", mcs_index=2,
                        nTpPi2BPSK=0, num_of_layers=1, rv=[0],
                        data_source=[], StartSymbolIndex=0,
                        NrOfSymbols=14, nTransPrecode=1, EnableULSCH=1,
                        EnableACK=0, EnableCSI1=0, EnableCSI2=0,
                        PortIndexList=[1000], nNrOfAntennaPorts=1,
                        nPMI=0))
    pusch["ResAlloType1"].update(RBStart=0, RBSize=48)   # 48 = 2^4*3 ok
    pusch["DMRS"].update(NumCDMGroupsWithoutData=2, DMRSAddPos=1)
    assert pusim.can_batch_pusch_rx(pusch, ["MMSE-IRC"])
    chan = chan_mod.gen_channel_model_config(
        model_format="customized", Nt=1, Nr=2, fm_inHz=200,
        multi_paths=[[0, 0, "Rayleigh", 0, 0]])
    ce = dict(CE_algo="DFT", L_symm_left_in_ns=200,
              L_symm_right_in_ns=200, eRB=2, enable_TO_comp=True,
              enable_FO_est=False, enable_FO_comp=False)
    ldpc = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)
    snrs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    kw = dict(ceq_algo_list=["MMSE-IRC"], n_slots=20, ce_config=ce,
              ldpc_config=ldpc, seed=3, use_batch=True)
    pusim.run_pusch_throughput(carrier, pusch, chan, snrs, **kw)  # warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        pusim.run_pusch_throughput(carrier, pusch, chan, snrs, **kw)
        best = max(best, len(snrs) * 20 / (time.perf_counter() - t0))
    return best


def main():
    _enable_compile_cache()
    profile: dict = {}
    msps = bench_ofdm_duc(profile)
    ldpc_cw_s, ldpc_b = bench_ldpc("flooded", 32)
    # layered schedule reaches the same BLER in half the iterations
    # (tests/test_ldpc.py::test_bler_layered_half_iterations), so its
    # L=16 point is the same-BLER deployment config
    lay_cw_s, lay_b = bench_ldpc("layered", 16)
    # validated fast mode for the same mixed-MS config (VERDICT r4
    # item 5 artifact: parity within 3 sigma for alpha<=0.8/beta>=0.3)
    lay_fast_cw_s, lay_fast_b = bench_ldpc("layered", 16,
                                           semantics="fast")
    scl_cw_s = bench_polar_scl()
    # UL PUSCH-UCI scale (nr_pusch_uci_decode.py:19: nMax=10, iIL=0,
    # CRC11) at N=1024
    scl_ul_cw_s = bench_polar_scl(B=512, K=512, E=1024, L=8, n_max=10,
                                  i_il=0, crc_len=11)
    # PDCCH blind decode: 64 candidates (16 per slot x 4 slots) at
    # AL4 (E=432), DCI size 40+CRC24, traced per-candidate RNTI
    rng_r = np.random.default_rng(5)
    rntis = rng_r.integers(1, 65519, size=64)
    scl_bd_cw_s = bench_polar_scl(B=64, K=64, E=432, L=8, n_max=9,
                                  i_il=1, crc_len=24, rnti=rntis)

    extra = [{
        "metric": "polar_scl_throughput",
        "value": round(scl_cw_s, 1),
        "unit": "codewords/s",
        "config": "N=512 K=164 L=8 CA-SCL chunked B=1024",
    }, {
        "metric": "polar_scl_ul_throughput",
        "value": round(scl_ul_cw_s, 1),
        "unit": "codewords/s",
        "config": "N=1024 K=512 E=1024 L=8 nMax=10 iIL=0 CRC11 "
                  "(PUSCH-UCI scale) B=512",
    }, {
        "metric": "pdcch_blind_decode_throughput",
        "value": round(scl_bd_cw_s, 1),
        "unit": "candidates/s",
        "config": "E=432 (AL4) K=64 L=8 CRC24+RNTI, 64 traced-rnti "
                  "candidates per dispatch",
    }, {
        "metric": "ldpc_decode_throughput",
        "value": round(ldpc_cw_s, 1),
        "unit": "codewords/s",
        "config": f"Zc=384 bgn=1 mixed-MS L=32 flooded B={ldpc_b}",
        "info_bits_per_s": round(ldpc_cw_s * 22 * 384, 0),
    }, {
        "metric": "ldpc_decode_throughput_layered",
        "value": round(lay_cw_s, 1),
        "unit": "codewords/s",
        "config": f"Zc=384 bgn=1 mixed-MS L=16 layered B={lay_b}",
        "info_bits_per_s": round(lay_cw_s * 22 * 384, 0),
    }, {
        "metric": "ldpc_decode_throughput_layered_fast",
        "value": round(lay_fast_cw_s, 1),
        "unit": "codewords/s",
        "config": f"Zc=384 bgn=1 mixed-MS L=16 layered B={lay_fast_b} "
                  "semantics=fast (opt-in relaxed check node; "
                  "BLER-curve parity for mixed-MS validated in "
                  "out/ldpc_fast_mode_r05.json, max |z| 2.50)",
        "info_bits_per_s": round(lay_fast_cw_s * 22 * 384, 0),
    }]
    try:
        slots_s = bench_link_level()
        extra.append({
            "metric": "link_level_pdsch_sweep",
            "value": round(slots_s, 1),
            "unit": "slots/s",
            # real-time factor vs the scs30 slot rate (2,000 slots/s):
            # 1.0 = the full TX+channel+RX sim keeps up with the air
            # interface (VERDICT r4 item 8)
            "rt_factor": round(slots_s / 2000.0, 4),
            "config": "TX + 1-tap Rayleigh fm=200 + batched-RX MMSE-IRC "
                      "+ LDPC L=16, BW20 scs30 Nt2/Nr4, 6 SNR x 20 "
                      "slots, end-to-end on chip",
        })
    except Exception as e:  # never fail the bench line on the sim path
        extra.append({"metric": "link_level_pdsch_sweep",
                      "error": repr(e)[:200]})
    try:
        tp_slots_s = bench_link_level_pusch_tp()
        extra.append({
            "metric": "link_level_pusch_tp_sweep",
            "value": round(tp_slots_s, 1),
            "unit": "slots/s",
            "rt_factor": round(tp_slots_s / 2000.0, 4),
            "config": "DFT-s-OFDM transform precoding + 1-tap Rayleigh "
                      "fm=200 + batched-RX MMSE-IRC + LDPC L=16, BW20 "
                      "scs30 1-layer Nt1/Nr2 48 PRB, 6 SNR x 20 slots, "
                      "end-to-end on chip",
        })
    except Exception as e:
        extra.append({"metric": "link_level_pusch_tp_sweep",
                      "error": repr(e)[:200]})

    if _REF_LDPC_CW_PER_S:
        # both repo configs reach the reference's L=32 BLER (layered
        # halves the iterations at equal BLER), so both ratios use the
        # reference's L=32 denominator
        by_name = {e["metric"]: e for e in extra}
        by_name["ldpc_decode_throughput"]["vs_baseline"] = \
            round(ldpc_cw_s / _REF_LDPC_CW_PER_S, 1)
        by_name["ldpc_decode_throughput_layered"]["vs_baseline"] = \
            round(lay_cw_s / _REF_LDPC_CW_PER_S, 1)

    # per-stage breakdown artifact (driver parses only the final line)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "profile_r05.json"), "w") as f:
        json.dump(profile, f, indent=1)

    print(json.dumps({
        "metric": "ofdm_duc_throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 1000.0, 3),
        "extra_metrics": extra,
    }))


if __name__ == "__main__":
    main()
