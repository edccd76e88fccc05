"""Generated protobuf modules for the options wire format."""
