from tputracer.accel.bruteforce import (  # noqa: F401
    Hit,
    intersect_brute,
    occluded_brute,
)
