from mjrl_tpu.models.fc_network import (
    init_mlp_params, mlp_forward, identity_transforms, Transforms)
from mjrl_tpu.models.policies import GaussianMLP, GaussianLinear, Policy
from mjrl_tpu.models.baselines import (
    ZeroBaseline, LinearBaseline, QuadraticBaseline, MLPBaseline)
