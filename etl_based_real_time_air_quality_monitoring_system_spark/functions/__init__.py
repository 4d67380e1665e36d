from .banding import AQI_BANDS, TEMP_BANDS, aqi_band, band, temp_category
from .jsonio import extract_props, to_json_payload
from .scoring import POLLUTION_WEIGHTS, pollution_score, weighted_score
from .timeparts import calendar_parts, with_calendar_parts

__all__ = [
    "AQI_BANDS",
    "TEMP_BANDS",
    "POLLUTION_WEIGHTS",
    "aqi_band",
    "band",
    "temp_category",
    "extract_props",
    "to_json_payload",
    "pollution_score",
    "weighted_score",
    "calendar_parts",
    "with_calendar_parts",
]
