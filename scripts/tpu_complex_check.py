"""Hardware proof of complex capability on the TPU (VERDICT rounds 2-4:
the reference's timestep + excitation stacks are complex-native,
/root/reference/src/algorithms/timestep/tdvp.jl:21-59 and
exci_transfer_system.jl:1-86, and the claim "TPU-native time evolution /
excitations" needs chip artifacts).

ROUND-4 FINDING (still true): the axon TPU runtime implements NO complex
dtype at all — even ``jnp.zeros((4,), complex64)`` fails UNIMPLEMENTED.
Everything complex runs the SPLIT-COMPLEX path (tensors/splitc.py):
complex tensors as real pairs, the same real-pair lowering XLA performs on
TPU backends that do support c64.

ON THE CHIP this script runs (round-5 surface, VERDICT r4 directive 4):
  1. the c64 probe (subprocess, so the failed trace cannot poison the
     main client) — records the UNIMPLEMENTED error strings;
  2. a FINITE split-complex TDVP quench (L=32, D=256, f32): TFIM ground
     state at g=1.5, quench to g=0.5, 3 steps — energy drift at the f32
     floor, parity vs a concurrent CPU complex128 trajectory, and the
     PRE-projection norm drift (the honest diagnostic, ADVICE r4);
  3. the same quench at L=16, D=32 in FLOAT64 (TPU-emulated) — the 1e-8
     parity story vs CPU c128;
  4. an INFINITE split-complex TDVP step (D=32, f64) vs CPU c128
     (algorithms/tdvp_split_infinite.py — the geometric-tail environment
     solves with complex phases, on chip);
  5. a QP DISPERSION POINT at p = 0.7 (not a multiple of pi — unreachable
     for any real-dtype path) on the infinite TFIM at D=16, f64, vs the
     exact dispersion 2 sqrt(g^2 - 2 g cos p + 1) and a CPU c128
     complex-native solve (algorithms/excitations_split.py).

Writes TPU_COMPLEX_r05.json at the repo root. Run alone (no concurrent
TPU processes); takes ~20-30 min (remote compiles + CPU references).
"""
import json
import subprocess
import sys
import time
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
jax.config.update("jax_enable_x64", True)   # sections 3-5 run f64 on chip
import jax.numpy as jnp
import numpy as np

L, D, G0, G1 = 32, 256, 1.5, 0.5
DT, NSTEP = 0.05, 3
M_KRYLOV = 20
L64, D64 = 16, 32          # float64 finite parity section
D_INF, G_INF0, G_INF1 = 32, 1.2, 1.5   # infinite step section
D_QP, G_QP, P_QP = 16, 1.5, 0.7        # dispersion section

PROBE_CODE = """
import jax, jax.numpy as jnp, json
# NOTE: constant inputs (zeros/ones) are folded at trace time and
# falsely report OK on a backend with no complex support — every probe
# must flow DEVICE-RANDOM data through the op and read the result back.
k = jax.random.PRNGKey(0)
a = jax.random.normal(k, (8, 8))
out = {}
for name, fn in [
    ("cast_c64", lambda: (a.astype(jnp.complex64) * 1j).sum()),
    ("matmul_c64", lambda: jax.jit(lambda x: (x + 1j * x) @ (x - 1j * x))(a)),
    ("fft_c64", lambda: jnp.fft.fft(a[0])),
]:
    try:
        r = fn()
        float(abs(jnp.asarray(r).ravel()[0]))  # force host readback
        out[name] = "OK"
    except Exception as e:
        out[name] = type(e).__name__ + ": " + str(e).splitlines()[0][:140]
print("PROBE " + json.dumps(out))
"""

CPU_REF_CODE = f"""
import sys; sys.path.insert(0, {str(ROOT)!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np, json
from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS, InfiniteMPS
from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
from mpskit_tpu.algorithms.tdvp import TDVP, timestep
from mpskit_tpu.algorithms.expval import expectation_value
from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
from mpskit_tpu.algorithms.excitations import (QuasiparticleAnsatz,
                                               excitations_infinite)

# -- finite c128 quench trajectories (f32 and f64 sections share code) --
def finite_traj(L, D, nstep, gs_tol, gs_maxiter):
    H0 = transverse_field_ising_lattice(g={G0}, dtype=np.float64)
    H1 = transverse_field_ising_lattice(g={G1}, dtype=np.float64)
    psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                           dtype=jnp.float64)
    psi, _, _ = find_groundstate_dmrg(psi, H0,
                                      DMRG(tol=gs_tol, maxiter=gs_maxiter))
    psi = FiniteMPS(psi.ALs.astype(jnp.complex128),
                    psi.ARs.astype(jnp.complex128),
                    psi.AC.astype(jnp.complex128), psi.center)
    es = [float(jnp.real(expectation_value(psi, H1)))]
    t = 0.0
    for _ in range(nstep):
        psi, _ = timestep(psi, H1, t, {DT}, TDVP())
        t += {DT}
        es.append(float(jnp.real(expectation_value(psi, H1))))
    return es

print("CPUREF_F32 " + json.dumps(finite_traj({L}, {D}, {NSTEP}, 1e-8, 12)),
      flush=True)
# the f64 section is the 1e-8 parity story: both sides converge the SAME
# seed to gs tol 1e-10 so the start states agree to solver tolerance
print("CPUREF_F64 " + json.dumps(finite_traj({L64}, {D64}, {NSTEP},
                                             1e-10, 30)), flush=True)

# -- infinite c128 quench step (energy density before/after) -----------
H0 = transverse_field_ising_lattice(g={G_INF0}, dtype=np.float64)
H1 = transverse_field_ising_lattice(g={G_INF1}, dtype=np.float64)
psi = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, {D_INF},
                         dtype=jnp.float64)
psi, envs, _ = find_groundstate_vumps(psi, H0, VUMPS(tol=1e-11,
                                                     maxiter=300))
psic = InfiniteMPS(*(x.astype(jnp.complex128)
                     for x in (psi.AL, psi.AR, psi.AC, psi.C)))
from mpskit_tpu.algorithms.tdvp import _timestep_infinite
es_inf = []
env = None
for _ in range(3):
    psic, envc, err = _timestep_infinite(psic, H1, {DT}, 30, 1e-10, 1e-12,
                                         env_guess=env)
    env = envc
    es_inf.append(float(jnp.real(envc.e_density)))
print("CPUREF_INF " + json.dumps({{"es": es_inf,
    "al": np.asarray(psi.AL).tolist()}}), flush=True)

# -- QP dispersion point at p = {P_QP} (complex-native) ----------------
Hq = transverse_field_ising_lattice(g={G_QP}, dtype=np.float64)
psiq = InfiniteMPS.random(jax.random.PRNGKey(0), 1, 2, {D_QP},
                          dtype=jnp.float64)
psiq, envq, _ = find_groundstate_vumps(psiq, Hq, VUMPS(tol=1e-12,
                                                       maxiter=300))
psiqc = InfiniteMPS(*(x.astype(jnp.complex128)
                      for x in (psiq.AL, psiq.AR, psiq.AC, psiq.C)))
envqc = hamiltonian_environments(psiqc, Hq, tol=1e-12)
alg = QuasiparticleAnsatz(tol=1e-10, krylovdim=24, maxrestarts=40)
es_q, _ = excitations_infinite(Hq, alg, [{P_QP}], psiqc, envs=envqc)
print("CPUREF_QP " + json.dumps({{"e": float(jnp.real(es_q[0, 0])),
    "al": np.asarray(psiq.AL).tolist()}}), flush=True)
"""


def tfim_gap(g, p):
    return 2.0 * np.sqrt(g * g - 2 * g * np.cos(p) + 1.0)


def finite_quench_on_chip(out, key, L, D, dtype, nstep, gs_tol=1e-8,
                          gs_maxiter=12):
    """Sections 2 and 3: the finite split quench at the given dtype."""
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
    from mpskit_tpu.algorithms.tdvp_split import (
        timestep_split, expectation_value_split, compute_right_envs_split,
    )
    from mpskit_tpu.environments.finite import stack_W, right_boundary
    from mpskit_tpu.states.finitemps import support_mask
    from mpskit_tpu.tensors.splitc import sc
    from mpskit_tpu.config import matmul_precision

    H0 = transverse_field_ising_lattice(g=G0, dtype=np.float64)
    H1 = transverse_field_ising_lattice(g=G1, dtype=np.float64)
    with matmul_precision(dtype):
        psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D, dtype=dtype)
        psi, _, _ = find_groundstate_dmrg(
            psi, H0, DMRG(tol=gs_tol, maxiter=gs_maxiter))
        psi = psi.move_center(0)
        state = (jnp.stack([psi.ALs, jnp.zeros_like(psi.ALs)], axis=0),
                 jnp.stack([psi.ARs, jnp.zeros_like(psi.ARs)], axis=0),
                 sc(psi.AC))
        Ws = stack_W(H1, L).astype(dtype)
        GRs = compute_right_envs_split(
            state[1], Ws, sc(right_boundary(Ws.shape[1], D, dtype)))
        es = [float(expectation_value_split(state[2], Ws, GRs))]
        masks = jnp.asarray(support_mask(L, 2, D))
        t0 = time.perf_counter()
        errs, drifts = [], []
        for _ in range(nstep):
            state, GRs, err, drift = timestep_split(state, H1, DT,
                                                    m=M_KRYLOV, masks=masks)
            es.append(float(expectation_value_split(state[2], Ws, GRs)))
            errs.append(float(err))
            drifts.append(float(drift))
        wall = time.perf_counter() - t0
    edrift = max(abs(e - es[0]) for e in es[1:]) / abs(es[0])
    out[key] = {
        "L": L, "D": D, "dtype": str(jnp.dtype(dtype)), "dt": DT,
        "steps": nstep, "krylov_m": M_KRYLOV,
        "energies_tpu_splitc": es, "rel_energy_drift": edrift,
        # the honest norm diagnostic: radial error of each step's Krylov
        # exponentials BEFORE the sphere projection (ADVICE r4 — the
        # post-projection norm is 1 by construction and proves nothing)
        "preprojection_norm_drift": drifts,
        "krylov_trunc_estimates": errs, "wall_s": round(wall, 2),
    }
    print(f"[{key}] E(t) = {es}, drift {edrift:.2e}, "
          f"pre-projection norm drift {max(drifts):.2e}, wall {wall:.1f}s",
          flush=True)
    assert np.isfinite(es).all()
    return es


def main():
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import InfiniteMPS
    from mpskit_tpu.algorithms.tdvp_split_infinite import (
        _timestep_infinite_split, split_state_from_infinite,
    )
    from mpskit_tpu.algorithms.excitations_split import dispersion_split
    from mpskit_tpu.algorithms.excitations import QuasiparticleAnsatz
    from mpskit_tpu.tensors.splitc import to_complex

    out = {"platform": str(jax.devices()[0]),
           "representation": "split-complex real pairs (tensors/splitc.py)"}

    # ---- 0. the c64 probe, in its own process ---------------------------
    probe = subprocess.run([sys.executable, "-c", PROBE_CODE],
                           capture_output=True, text=True, timeout=900)
    for line in probe.stdout.splitlines():
        if line.startswith("PROBE "):
            out["c64_backend_probe"] = json.loads(line[len("PROBE "):])
    print("c64 probe:", out.get("c64_backend_probe"), flush=True)

    # launch the CPU c128 references concurrently (CPU-only subprocess)
    cpu_proc = subprocess.Popen([sys.executable, "-c", CPU_REF_CODE],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)

    # ---- 2. finite split TDVP quench, f32 (the round-4 headline) -------
    es_f32 = finite_quench_on_chip(out, "tdvp_quench_split", L, D,
                                   jnp.float32, NSTEP)
    assert out["tdvp_quench_split"]["rel_energy_drift"] < 2e-3
    assert max(out["tdvp_quench_split"]["preprojection_norm_drift"]) < 1e-2

    # ---- 3. finite split TDVP quench, FLOAT64 (1e-8 parity story) ------
    es_f64 = finite_quench_on_chip(out, "tdvp_quench_split_f64", L64, D64,
                                   jnp.float64, NSTEP, gs_tol=1e-10,
                                   gs_maxiter=30)
    assert out["tdvp_quench_split_f64"]["rel_energy_drift"] < 1e-8
    assert max(out["tdvp_quench_split_f64"]["preprojection_norm_drift"]) \
        < 1e-9

    # collect the CPU references (needed for the infinite/QP ground states
    # so chip and CPU solve from the SAME uniform state)
    cpu_out, _ = cpu_proc.communicate(timeout=5400)
    refs = {}
    for line in cpu_out.splitlines():
        for tag in ("CPUREF_F32", "CPUREF_F64", "CPUREF_INF", "CPUREF_QP"):
            if line.startswith(tag + " "):
                refs[tag] = json.loads(line[len(tag) + 1:])
    assert set(refs) == {"CPUREF_F32", "CPUREF_F64", "CPUREF_INF",
                         "CPUREF_QP"}, refs.keys()

    rel32 = max(abs(a - b) for a, b in zip(es_f32, refs["CPUREF_F32"])) \
        / abs(refs["CPUREF_F32"][0])
    out["tdvp_quench_split"]["energies_cpu_c128"] = refs["CPUREF_F32"]
    out["tdvp_quench_split"]["rel_err_vs_cpu_c128"] = rel32
    print(f"finite f32 vs CPU c128: rel err {rel32:.2e}", flush=True)
    assert rel32 < 5e-3, rel32    # independent ground states; f32 floor

    rel64 = max(abs(a - b) for a, b in zip(es_f64, refs["CPUREF_F64"])) \
        / abs(refs["CPUREF_F64"][0])
    out["tdvp_quench_split_f64"]["energies_cpu_c128"] = refs["CPUREF_F64"]
    out["tdvp_quench_split_f64"]["rel_err_vs_cpu_c128"] = rel64
    print(f"finite f64 vs CPU c128: rel err {rel64:.2e}", flush=True)
    assert rel64 < 1e-8, rel64    # the repo's BASELINE parity bar

    # ---- 4. INFINITE split TDVP steps on chip (f64, D=32) --------------
    H1 = transverse_field_ising_lattice(g=G_INF1, dtype=np.float64)
    AL = jnp.asarray(np.array(refs["CPUREF_INF"]["al"]), jnp.float64)
    psi = InfiniteMPS.from_AL(AL)         # same gs the CPU ref evolved
    ps = split_state_from_infinite(psi)
    es_inf, drifts_inf = [], []
    env = None
    t0 = time.perf_counter()
    for _ in range(3):
        ps, envs, err, drift = _timestep_infinite_split(
            ps, H1, 30, DT, 1e-12, env_guess=env)
        env = (envs[0], envs[1])
        es_inf.append(float(np.real(complex(to_complex(envs[2])))))
        drifts_inf.append(float(drift))
    wall_inf = time.perf_counter() - t0
    es_cpu_inf = refs["CPUREF_INF"]["es"]
    # step 1 runs from the IDENTICAL state on both paths -> f64-exact
    # parity; later steps evolve states that differ by the two paths'
    # gauge-reconstruction variants (the complex-native path re-gauges
    # uniformly via from_AL each step, the split path locally via
    # QR/LQ — both valid TDVP reconstructions, differing at the O(dt^2)
    # integrator-variant level), so the trajectory bar is 1e-5
    rel1 = abs(es_inf[0] - es_cpu_inf[0]) / abs(es_cpu_inf[0])
    rel_traj = max(abs(a - b) for a, b in zip(es_inf, es_cpu_inf)) \
        / abs(es_cpu_inf[0])
    out["tdvp_infinite_split"] = {
        "D": D_INF, "dtype": "float64", "dt": DT, "steps": 3,
        "e_density_tpu": es_inf, "e_density_cpu_c128": es_cpu_inf,
        "rel_err_step1_vs_cpu_c128": rel1,
        "rel_err_trajectory_vs_cpu_c128": rel_traj,
        "preprojection_norm_drift": drifts_inf,
        "wall_s": round(wall_inf, 2),
    }
    print(f"infinite split TDVP: e(t) = {es_inf} vs CPU {es_cpu_inf}, "
          f"step-1 rel {rel1:.2e}, trajectory rel {rel_traj:.2e}, "
          f"wall {wall_inf:.1f}s", flush=True)
    assert rel1 < 1e-11, rel1       # identical-state step: f64 parity
    assert rel_traj < 1e-5, rel_traj

    # ---- 5. QP dispersion at p = 0.7 on chip (f64, D=16) ---------------
    ALq = jnp.asarray(np.array(refs["CPUREF_QP"]["al"]), jnp.float64)
    psiq = InfiniteMPS.from_AL(ALq)
    from mpskit_tpu.environments.infinite_ham import hamiltonian_environments
    Hq = transverse_field_ising_lattice(g=G_QP, dtype=np.float64)
    envq = hamiltonian_environments(psiq, Hq, tol=1e-12)
    alg = QuasiparticleAnsatz(tol=1e-9, krylovdim=24, maxrestarts=40)
    t0 = time.perf_counter()
    e_qp, _X, resid = dispersion_split(Hq, psiq, envq, P_QP, alg=alg)
    e_qp = float(e_qp)
    wall_qp = time.perf_counter() - t0
    exact = tfim_gap(G_QP, P_QP)
    out["qp_dispersion_split"] = {
        "p": P_QP, "g": G_QP, "D": D_QP, "dtype": "float64",
        "energy_tpu": e_qp, "energy_cpu_c128": refs["CPUREF_QP"]["e"],
        "energy_exact": exact, "residual": float(resid),
        "wall_s": round(wall_qp, 2),
    }
    print(f"QP dispersion p={P_QP}: chip {e_qp:.10f} vs CPU c128 "
          f"{refs['CPUREF_QP']['e']:.10f} vs exact {exact:.10f}, "
          f"wall {wall_qp:.1f}s", flush=True)
    assert abs(e_qp - refs["CPUREF_QP"]["e"]) < 5e-6
    assert abs(e_qp - exact) < 1e-3

    (ROOT / "TPU_COMPLEX_r05.json").write_text(json.dumps(out, indent=1))
    print("WROTE TPU_COMPLEX_r05.json")


if __name__ == "__main__":
    main()
