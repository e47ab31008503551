"""(stub — filled in as the inventory is built)"""
