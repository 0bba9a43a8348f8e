"""Subpackage of big_data_flight_spark."""
