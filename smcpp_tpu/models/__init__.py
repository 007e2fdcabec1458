from .model import PiecewiseModel, SMCModel, SMCTwoPopulationModel, model_from_dict  # noqa: F401
