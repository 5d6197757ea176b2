from .negative import (  # noqa: F401
    TrainSampler,
    BidirectionalIterator,
    PrefetchIterator,
    build_train_iterator,
)
