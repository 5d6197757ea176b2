from .vocab import Dataset, load_dataset, save_dataset, read_dict, read_triple  # noqa: F401
from .filterset import FilterSets, TrueIndex, count_frequency, subsampling_weights  # noqa: F401
from . import synthetic  # noqa: F401
