"""Multimodal (image/audio/video) column plumbing — see :mod:`.media`."""

from .media import (
    MEDIA_META_SCHEMA,
    audio_features,
    decode_image,
    frame_sample,
    image_features,
    media_stats,
    resize_images,
    text_as_media,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "audio_features",
    "decode_image",
    "frame_sample",
    "image_features",
    "media_stats",
    "resize_images",
    "text_as_media",
]
