from mjrl_tpu.ops.gae import discount_sum, discounted_returns, gae_advantages
from mjrl_tpu.ops.cg import cg_solve
from mjrl_tpu.ops.flat import ravel, unravel_like, tree_dot, tree_add_scaled
