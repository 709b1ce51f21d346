from cnmnet_tpu.evals.seven_scenes_eval import (
    evaluate_seven_scenes,
    aggregate_metrics,
    EVAL_PROTOCOLS,
)

__all__ = ["evaluate_seven_scenes", "aggregate_metrics", "EVAL_PROTOCOLS"]
