"""Data pipeline: featurization, lane-graph construction, packing, datasets.

Host-side (numpy/scipy) counterpart of the reference's data layer
(reference data.py, preprocess_data.py): everything dynamic happens here, so
the device only ever sees static-shape PackedBatch pytrees.
"""

from lanegcn_tpu.data.featurize import featurize_scenario  # noqa: F401
from lanegcn_tpu.data.lane_graph import build_lane_graph  # noqa: F401
from lanegcn_tpu.data.packing import pack_batch  # noqa: F401
from lanegcn_tpu.data.raster import RasterMapQuery, rasterize_lane_graph  # noqa: F401
from lanegcn_tpu.data.synthetic import make_synthetic_scenario  # noqa: F401
