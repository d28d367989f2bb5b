"""Vendor bridge sources (S4/S5): rewrite Segment-analytics.js and
Amplitude payloads into Snowplow ``payload_data/1-0-4`` envelopes.
"""
