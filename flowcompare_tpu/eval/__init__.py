from .evaluate import calc_change, clamp_infs, evaluate_on_test, log_prob_to_change

__all__ = ["calc_change", "clamp_infs", "evaluate_on_test", "log_prob_to_change"]
