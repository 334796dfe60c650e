"""Shared domain constants.

Texture regions: which parsing classes carry each fused texture attribute
(reference data/segm_attr_dataset.py:60-69, models/sample_model.py:443-447).
"""

UPPER_CLASSES = (1, 4)
LOWER_CLASSES = (3, 5, 21)
OUTER_CLASSES = (2,)
ABSENT_ATTR = 17
