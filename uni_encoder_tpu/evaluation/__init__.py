from .evaluator import DatasetEvaluator, DatasetEvaluators, inference_on_dataset
