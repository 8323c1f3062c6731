from mjrl_tpu.algos.batch_reinforce import BatchREINFORCE
from mjrl_tpu.algos.npg_cg import NPG
from mjrl_tpu.algos.trpo import TRPO
from mjrl_tpu.algos.ppo_clip import PPO
from mjrl_tpu.algos.behavior_cloning import BC
from mjrl_tpu.algos.dapg import DAPG
from mjrl_tpu.algos.mbac import MBAC
from mjrl_tpu.algos.model_accel.nn_dynamics import (WorldModel,
                                                    WorldModelEnsemble)
from mjrl_tpu.algos.model_accel.model_accel_npg import ModelAccelNPG
from mjrl_tpu.algos.model_accel.model_learning_mpc import MPCPolicy
