"""Minimal TPU compile probe for the span-DMA kernel (tiny shapes)."""
import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.ops.pallas import gather_kernel as gk

E, Q, NS, SR = 8, 16, 4, 32
window = gk.span_window(SR)
NP = gk._round_up(300 + window, gk.LANES)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.random((E, Q, 3)).astype(np.float32))
c = jnp.zeros((E, 3), jnp.float32)
ss = jnp.zeros((E, NS), jnp.int32)
sl = jnp.full((E, NS), 5, jnp.int32)
srch_t = jnp.asarray(rng.random((4, NP)).astype(np.float32))
out = gk.span_moments(q, c, ss, sl, srch_t, (0.5,), SR)
jax.block_until_ready(out)
print("MINIMAL SPAN KERNEL COMPILED+RAN", out.shape, float(out.sum()))
