from .spec import Algorithm, load_spec, run_algorithm, select_algorithm  # noqa: F401
