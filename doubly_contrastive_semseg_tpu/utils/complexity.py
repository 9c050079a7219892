"""Model complexity probe (reference ``utils/get_model_complexity.py:1-13``
used ptflops; here XLA's own cost analysis of the compiled forward)."""

from __future__ import annotations

from typing import Dict, Tuple


def model_complexity(model, input_shape: Tuple[int, ...] = (1, 768, 768, 3),
                     **apply_kwargs) -> Dict[str, float]:
    """Returns {'params_m', 'flops_g', 'bytes_accessed_g'} for one forward."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False, **apply_kwargs)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(variables["params"]))

    def fwd(v, img):
        return model.apply(v, img, train=False, **apply_kwargs)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per computation
        cost = cost[0]
    return {
        "params_m": n_params / 1e6,
        "flops_g": float(cost.get("flops", 0.0)) / 1e9,
        "bytes_accessed_g": float(cost.get("bytes accessed", 0.0)) / 1e9,
    }
