"""Nearline plane: streaming latest-behaviour features."""

from sparrowrecsys_tpu.nearline.stream import (
    FileWatchSource,
    LatestRatingStream,
    RatingEvent,
)
