from mjrl_tpu.samplers.rollout import (rollout_batch, sample_paths,
                                       sample_data_batch, paths_to_list)
