package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Truth table: `/root/reference/Data_Discovery_File.sql:27-53` (dtype →
  * engine type) and `/root/reference/Data_Quality_Table.sql:43-49,89`
  * (engine-name → family).
  */
class TypeMapperSpec extends AnyFunSuite {

  test("string-ish types map to VARCHAR") {
    assert(TypeMapper.toEngineType(StringType) == "VARCHAR")
    assert(TypeMapper.toEngineType(VarcharType(10)) == "VARCHAR")
    assert(TypeMapper.toEngineType(CharType(3)) == "VARCHAR")
  }

  test("integral types map to NUMBER") {
    Seq(ByteType, ShortType, IntegerType, LongType).foreach { t =>
      assert(TypeMapper.toEngineType(t) == "NUMBER", t)
    }
    assert(TypeMapper.toEngineType(DecimalType(38, 0)) == "NUMBER")
  }

  test("floating types map to FLOAT") {
    Seq(FloatType, DoubleType, DecimalType(10, 2)).foreach { t =>
      assert(TypeMapper.toEngineType(t) == "FLOAT", t)
    }
  }

  test("bool / temporal / fallback") {
    assert(TypeMapper.toEngineType(BooleanType) == "BOOLEAN")
    assert(TypeMapper.toEngineType(TimestampType) == "TIMESTAMP")
    assert(TypeMapper.toEngineType(DateType) == "TIMESTAMP")
    // VARIANT fallback (`Data_Discovery_File.sql:51-53`)
    assert(TypeMapper.toEngineType(ArrayType(FloatType)) == "VARIANT")
    assert(TypeMapper.toEngineType(BinaryType) == "VARIANT")
  }

  test("families drive profiling stat selection") {
    assert(TypeMapper.familyOf(LongType) == TypeMapper.NumericFamily)
    assert(TypeMapper.familyOf(DoubleType) == TypeMapper.NumericFamily)
    assert(TypeMapper.familyOf(StringType) == TypeMapper.StringFamily)
    assert(TypeMapper.familyOf(TimestampType) == TypeMapper.TemporalFamily)
    assert(TypeMapper.familyOf(ArrayType(LongType)) == TypeMapper.OtherFamily)
  }

  test("catalog-name classification mirrors the ILIKE dispatch") {
    assert(TypeMapper.familyOfEngineName("NUMBER") ==
      TypeMapper.NumericFamily)
    assert(TypeMapper.familyOfEngineName("varchar") ==
      TypeMapper.StringFamily)
    assert(TypeMapper.familyOfEngineName("TIMESTAMP") ==
      TypeMapper.TemporalFamily)
    assert(TypeMapper.familyOfEngineName("GEOGRAPHY") ==
      TypeMapper.OtherFamily)
  }
}
