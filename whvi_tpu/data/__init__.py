from whvi_tpu.data.toy import cubic_data, polynomial_data

__all__ = ["cubic_data", "polynomial_data"]
