from icl_tpu.eval.infer2d import evaluate_acdc_volumes, make_slice_predictor

__all__ = ["make_slice_predictor", "evaluate_acdc_volumes"]
