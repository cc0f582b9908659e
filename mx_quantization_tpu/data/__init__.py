"""Input pipelines: ImageNet folder loading (native C++ decoder + PIL
fallback), repeated-augmentation sampling."""

from .imagenet import iterate_imagenet, list_imagenet
from .samplers import ra_sampler_indices
