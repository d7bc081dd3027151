"""Pure numpy / pure Python kernels used inside Ray Data UDFs."""
