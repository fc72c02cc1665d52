from orbit2_tpu.registry import METRICS_REGISTRY
from orbit2_tpu.metrics.metrics import (
    MetricsMetaInfo,
    Metric,
    LatitudeWeightedMetric,
    ClimatologyBasedMetric,
    TransformedMetric,
)
from orbit2_tpu.metrics import functional
