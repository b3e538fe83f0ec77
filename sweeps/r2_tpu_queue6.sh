#!/bin/bash
# Queue 6: (a) hardware VJP record for the fused Pallas kernel,
# (b) END-TO-END backend comparison — full sharded ELBO train step
# (fwd+bwd+Adam) with whvi_mul routed through pallas vs the XLA default.
# One TPU job at a time (remote-compile contention).
cd /root/repo
echo "=== pallas_hw_gradcheck $(date +%T)"
timeout 1800 python - <<'PY' 2>/dev/null
import jax, jax.numpy as jnp, json
from whvi_tpu.ops.fwht_pallas import whvi_mul_pallas
from whvi_tpu.ops.hadamard import fwht

def jref(s1, u, s2, x):
    return s1 * fwht(u * fwht(s2 * x))

print("backend=" + jax.default_backend())
for D in (1024, 4096, 8192):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    s1, u, s2 = (jax.random.normal(k, (D,)) for k in ks[:3])
    x = jax.random.normal(ks[3], (64, D))
    ct = jax.random.normal(ks[4], (64, D))

    @jax.jit
    def g_pallas(s1, u, s2, x):
        _, vjp = jax.vjp(lambda a, b, c, d: whvi_mul_pallas(a, b, c, d), s1, u, s2, x)
        return vjp(ct)

    @jax.jit
    def g_jnp(s1, u, s2, x):
        _, vjp = jax.vjp(jref, s1, u, s2, x)
        return vjp(ct)

    gp = g_pallas(s1, u, s2, x)
    gj = g_jnp(s1, u, s2, x)
    errs = [
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        for a, b in zip(gp, gj)
    ]
    print(json.dumps({"D": D, "vjp_rel_err_s1_u_s2_x": [round(e, 5) for e in errs]}))
PY
echo "=== e2e_pallas_backend $(date +%T)"
timeout 5000 python experiments/run_scaling.py --sizes 4096 8192 --batch 256 \
    --samples 8 --steps 30 --backend pallas 2>/dev/null
echo "=== done $(date +%T)"
