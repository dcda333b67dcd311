"""Hardware proof of COMPLEX time evolution on the TPU (VERDICT round-2
item 3: "complex-dtype time evolution has never been proven on the actual
TPU" — the reference's timestep stack runs complex by default,
/root/reference/src/algorithms/timestep/).

complex128 is unsupported on TPU (CLAUDE.md), so the chip path is
complex64 (f32 pairs). This script runs, ON THE CHIP:

  1. a c64 TDVP quench on the finite TFIM (L=32, D=256): ground state at
     g=1.5 (f32 DMRG), quench to g=0.5, 3 TDVP steps of dt=0.05; asserts
     the energy drift stays at the c64 noise floor and the energies match
     a CPU complex128 reference trajectory run by a subprocess;
  2. one c64 quasiparticle dispersion point at p=pi/2 against the exact
     TFIM dispersion 2 sqrt(1 + g^2 - 2 g cos p).

Writes TPU_COMPLEX_r03.json at the repo root. Run alone (no concurrent
TPU processes); takes ~10-15 min (remote compiles + the CPU reference).
"""
import json
import subprocess
import sys
import time
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

L, D, G0, G1 = 32, 256, 1.5, 0.5
DT, NSTEP = 0.05, 3
D_QP, P = 64, np.pi / 2

CPU_REF_CODE = f"""
import sys; sys.path.insert(0, {str(ROOT)!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np, json
from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
from mpskit_tpu.algorithms.tdvp import TDVP, timestep
from mpskit_tpu.algorithms.expval import expectation_value

H0 = transverse_field_ising_lattice(g={G0}, dtype=np.float64)
H1 = transverse_field_ising_lattice(g={G1}, dtype=np.float64)
psi = FiniteMPS.random(jax.random.PRNGKey(0), {L}, 2, {D}, dtype=jnp.float64)
psi, _, _ = find_groundstate_dmrg(psi, H0, DMRG(tol=1e-8, maxiter=12))
psi = FiniteMPS(psi.ALs.astype(jnp.complex128), psi.ARs.astype(jnp.complex128),
                psi.AC.astype(jnp.complex128), psi.center)
es = [float(jnp.real(expectation_value(psi, H1)))]
t = 0.0
for _ in range({NSTEP}):
    psi, _ = timestep(psi, H1, t, {DT}, TDVP())
    t += {DT}
    es.append(float(jnp.real(expectation_value(psi, H1))))
print("CPUREF " + json.dumps(es))
"""


def main():
    from mpskit_tpu.models.hamiltonians import (
        transverse_field_ising_lattice, transverse_field_ising)
    from mpskit_tpu.states import FiniteMPS, InfiniteMPS
    from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
    from mpskit_tpu.algorithms.tdvp import TDVP, timestep
    from mpskit_tpu.algorithms.expval import expectation_value
    from mpskit_tpu.algorithms.vumps import VUMPS, find_groundstate_vumps
    from mpskit_tpu.algorithms.excitations import (
        QuasiparticleAnsatz, excitations_infinite)
    from mpskit_tpu.config import matmul_precision

    out = {"platform": str(jax.devices()[0]), "dtype": "complex64"}

    # launch the CPU c128 reference concurrently (CPU-only subprocess)
    cpu_proc = subprocess.Popen([sys.executable, "-c", CPU_REF_CODE],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)

    # ---- 1. finite c64 TDVP quench on the chip -------------------------
    H0 = transverse_field_ising_lattice(g=G0, dtype=np.float64)
    H1 = transverse_field_ising_lattice(g=G1, dtype=np.float64)
    with matmul_precision(jnp.float32):
        psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                               dtype=jnp.float32)
        psi, _, _ = find_groundstate_dmrg(psi, H0, DMRG(tol=1e-8, maxiter=12))
    psi = FiniteMPS(psi.ALs.astype(jnp.complex64),
                    psi.ARs.astype(jnp.complex64),
                    psi.AC.astype(jnp.complex64), psi.center)
    with matmul_precision(jnp.complex64):
        es = [float(jnp.real(expectation_value(psi, H1)))]
        t0 = time.perf_counter()
        t = 0.0
        for _ in range(NSTEP):
            psi, _ = timestep(psi, H1, t, DT, TDVP())
            t += DT
            es.append(float(jnp.real(expectation_value(psi, H1))))
        wall = time.perf_counter() - t0
    drift = max(abs(e - es[0]) for e in es[1:]) / abs(es[0])
    norm_err = abs(float(jnp.real(psi.dot(psi))) - 1.0)
    out["tdvp_quench"] = {
        "L": L, "D": D, "dt": DT, "steps": NSTEP,
        "energies_tpu_c64": es, "rel_energy_drift": drift,
        "norm_error": norm_err, "wall_s": round(wall, 2),
    }
    print(f"TPU c64 TDVP: E(t) = {es}, drift {drift:.2e}, "
          f"norm err {norm_err:.2e}", flush=True)
    assert np.isfinite(es).all()
    assert drift < 2e-3, f"energy drift {drift} above the c64 floor"

    # ---- 2. c64 QP dispersion point on the chip ------------------------
    g = G0
    H = transverse_field_ising(g=g, dtype=np.float64)
    with matmul_precision(jnp.float32):
        psi_i = InfiniteMPS.random(jax.random.PRNGKey(1), 1, 2, D_QP,
                                   dtype=jnp.float32)
        psi_i, envs, _ = find_groundstate_vumps(
            psi_i, H, VUMPS(tol=1e-7, maxiter=120))
    psi_c = InfiniteMPS(psi_i.AL.astype(jnp.complex64),
                        psi_i.AR.astype(jnp.complex64),
                        psi_i.AC.astype(jnp.complex64),
                        psi_i.C.astype(jnp.complex64))
    with matmul_precision(jnp.complex64):
        es_qp, _ = excitations_infinite(
            H, QuasiparticleAnsatz(tol=1e-4), P, psi_c, num=1)
    e_qp = float(np.real(np.asarray(es_qp)).reshape(-1)[0])
    e_exact = 2 * np.sqrt(1 + g * g - 2 * g * np.cos(P))
    out["qp_dispersion"] = {
        "D": D_QP, "p": P, "e_tpu_c64": e_qp, "e_exact": e_exact,
        "abs_err": abs(e_qp - e_exact),
    }
    print(f"TPU c64 QP at p=pi/2: {e_qp:.6f} vs exact {e_exact:.6f}",
          flush=True)
    assert abs(e_qp - e_exact) < 5e-3

    # ---- CPU c128 reference comparison ---------------------------------
    cpu_out, _ = cpu_proc.communicate(timeout=3600)
    es_cpu = None
    for line in cpu_out.splitlines():
        if line.startswith("CPUREF "):
            es_cpu = json.loads(line[len("CPUREF "):])
    assert es_cpu is not None, "CPU reference run failed"
    rel = max(abs(a - b) for a, b in zip(es, es_cpu)) / abs(es_cpu[0])
    out["tdvp_quench"]["energies_cpu_c128"] = es_cpu
    out["tdvp_quench"]["rel_err_vs_cpu_c128"] = rel
    print(f"CPU c128 E(t) = {es_cpu}; TPU-vs-CPU rel err {rel:.2e}",
          flush=True)
    # the two trajectories start from independently converged ground
    # states (f32 vs f64 DMRG) — agreement at the c64/f32 floor is the bar
    assert rel < 5e-3, rel

    (ROOT / "TPU_COMPLEX_r03.json").write_text(json.dumps(out, indent=1))
    print("WROTE TPU_COMPLEX_r03.json")


if __name__ == "__main__":
    main()
