"""Engine exceptions, named for parity with the reference's
`«ds»/datastream/exceptions.py` (SURVEY.md §1.1, §2.8 — names carry the
§0 citation caveat; semantics are the contract)."""


class DatastreamError(Exception):
    """Base class for engine errors."""


class StreamNotFound(DatastreamError):
    """No stream matches the given id / query tags."""


class MultipleStreamsReturned(DatastreamError):
    """Query tags matched more than one stream where one was required."""


class InvalidTimestamp(DatastreamError):
    """Append with check_timestamp=True saw ts <= stream.latest_ts
    (reference: monotonic-append rule, SURVEY T1)."""


class UnsupportedValueType(DatastreamError):
    """value_type outside {numeric, nominal, graph} or a mistyped append."""


class UnsupportedDownsampler(DatastreamError):
    """Requested downsampler key not materialized for this stream."""


class UnsupportedGranularity(DatastreamError):
    """Granularity finer than the stream's highest_granularity."""


class AppendToDerivedStreamNotAllowed(DatastreamError):
    """Direct appends to a derived stream are forbidden (SURVEY §1.1)."""


class OutstandingDependenciesError(DatastreamError):
    """delete_streams refused: other streams derive from the target."""


class InconsistentStreamConfiguration(DatastreamError):
    """ensure_stream matched an existing stream with a conflicting spec."""


class StreamAlreadyExists(DatastreamError):
    """ensure_stream attempted to create a stream that already exists."""
