from gansynth_tpu.data.nsynth import (  # noqa: F401
    NSYNTH_FEATURES,
    make_nsynth_example_iterator,
    make_nsynth_iterator,
    prefetch_to_mesh,
)
from gansynth_tpu.data.fixtures import (  # noqa: F401
    synthesize_note,
    write_synthetic_tfrecords,
)
from gansynth_tpu.data.native_tfrecord import (  # noqa: F401
    NSynthExample,
    make_native_iterator,
    read_examples,
)
