"""Bind reader classes into the registry (kept separate so readers.py has
no registry dependency and can be unit-tested standalone)."""
from rechorus_tpu import registry
from rechorus_tpu.data.readers import (BaseReader, ContextReader, ContextSeqReader,
    ImpressionContextReader, ImpressionReader, ImpressionSeqReader, KDAReader, KGReader, SeqReader)

registry.register_reader("BaseReader")(BaseReader)
registry.register_reader("SeqReader")(SeqReader)
registry.register_reader("KGReader")(KGReader)
registry.register_reader("KDAReader")(KDAReader)
registry.register_reader("ContextReader")(ContextReader)
registry.register_reader("ContextSeqReader")(ContextSeqReader)
registry.register_reader("ImpressionReader")(ImpressionReader)
registry.register_reader("ImpressionSeqReader")(ImpressionSeqReader)
registry.register_reader("ImpressionContextReader")(ImpressionContextReader)
