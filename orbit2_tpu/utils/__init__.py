from orbit2_tpu.utils.image_metrics import psnr, ssim
from orbit2_tpu.utils.inference import test_on_many_images
from orbit2_tpu.utils.mc_dropout import get_monte_carlo_predictions
from orbit2_tpu.utils.profiler import ProfileTimer, start_trace, stop_trace
from orbit2_tpu.utils.visualize import (
    rank_histogram,
    stitched_inference,
    visualize_at_index,
    visualize_mean_bias,
)
from orbit2_tpu.utils.loaders import (
    load_model_module,
    load_downscaling_module,
    load_forecasting_module,
    load_climatebench_module,
    load_architecture,
    load_optimizer,
    load_lr_scheduler,
    load_loss,
    load_transform,
)
