from parallel_gps_tpu.kernels.base import Product, SDEKernel, Sum
from parallel_gps_tpu.kernels.matern import Matern12, Matern32, Matern52
from parallel_gps_tpu.kernels.periodic import Periodic
from parallel_gps_tpu.kernels.rbf import RBF

__all__ = [
    "SDEKernel",
    "Sum",
    "Product",
    "Matern12",
    "Matern32",
    "Matern52",
    "RBF",
    "Periodic",
]
