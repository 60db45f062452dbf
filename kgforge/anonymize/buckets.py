"""Bucket-count formula (reference: service/anonymizer/Anonymization.java:77-82).

g = floor( 1 / (1 - (1 - 0.99^(1/k))^(1/k))^(1/n) )

(README.md:70-74 claims sqrt(n); the code wins — validated against 5 golden
fixture data points: (k=100,n=1)→11, (k=100,n=2)→3, (k=1000,n=3)→4,
(k=27,n=2)→1, (k=15,n=2)→1.)
"""

from __future__ import annotations

import math


def calculate_number_of_buckets(data_size: int, number_attributes: int) -> int:
    return int(
        math.floor(
            1.0
            / math.pow(
                1.0 - math.pow(1.0 - math.pow(0.99, 1.0 / data_size), 1.0 / data_size),
                1.0 / number_attributes,
            )
        )
    )
