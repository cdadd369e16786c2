"""Model introspection — the reference's model.summary()/plot_model calls
(ref: bbhMahoGANy.py:1122-1126, 2_model_version/.../subtract_model.py:197)."""

import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def model_summary(model, input_shape, train: bool = False) -> str:
    """Layer table via flax tabulate (the Keras summary equivalent)."""
    import flax.linen as nn

    x = jnp.zeros((1, *input_shape), jnp.float32)
    return nn.tabulate(
        model, jax.random.PRNGKey(0),
        console_kwargs={"width": 120, "force_terminal": False},
    )(x, train=train)
