package graft

import java.sql.Timestamp

import graft.chunk.Chunker
import graft.core.FileRecord

/** Language-faithful chunker fidelity for JS/TS, Rust, Ruby, PHP, C#,
  * Dart — mirrors the invariants of the reference's parser tests
  * (`tests/test_js_parser.py`, `test_rust_parser.py`,
  * `test_ruby_parser.py`, `test_php_parser.py`, `test_dart_parser.py`;
  * chunk types per `parsers/{javascript,rust,ruby,php,csharp,dart}.py`).
  */
class LangChunkerSpec extends SparkSpec {

  private def rec(path: String, lang: String, content: String) =
    FileRecord(path, lang, Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  // ---- JavaScript (test_js_parser.py) --------------------------------

  private val jsCode =
    """import React from 'react';
      |import { useState } from 'react';
      |
      |/**
      | * A simple counter component
      | */
      |function Counter(props) {
      |    const [count, setCount] = useState(0);
      |    return count;
      |}
      |
      |/**
      | * Utility class for data processing
      | */
      |class DataProcessor extends BaseProcessor {
      |    constructor() {
      |        this.data = [];
      |    }
      |
      |    /**
      |     * Add an item to the data array
      |     */
      |    addItem(item) {
      |        this.data.push(item);
      |    }
      |
      |    processAll() {
      |        return this.data.map(item => item.toString());
      |    }
      |}
      |
      |const calculateArea = (radius) => {
      |    return Math.PI * radius * radius;
      |};
      |
      |async function fetchData(url) {
      |    const response = await fetch(url);
      |    return await response.json();
      |}
      |""".stripMargin

  test("js: functions, classes, methods, arrow consts extracted") {
    val chunks = Chunker.chunkFile(rec("app.js", "javascript", jsCode))
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName.contains("Counter") && byName("Counter").chunk_type == "function")
    assert(byName.contains("fetchData") && byName("fetchData").chunk_type == "function")
    assert(byName.contains("calculateArea") && byName("calculateArea").chunk_type == "function")
    assert(byName("DataProcessor").chunk_type == "class")
    assert(byName("DataProcessor").inherits_from == Seq("BaseProcessor"))
    // methods carry the class as parent
    assert(byName("addItem").chunk_type == "method")
    assert(byName("addItem").parent_name == "DataProcessor")
    assert(byName("processAll").hierarchy_path == "DataProcessor.processAll")
  }

  test("js: JSDoc above the decl becomes the docstring") {
    val chunks = Chunker.chunkFile(rec("app.js", "javascript", jsCode))
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("Counter").docstring == "A simple counter component")
    assert(byName("addItem").docstring == "Add an item to the data array")
  }

  // ---- TypeScript ----------------------------------------------------

  private val tsCode =
    """export interface UserProps extends BaseProps {
      |  id: number;
      |  name: string;
      |}
      |
      |export enum Status {
      |  Active,
      |  Inactive,
      |}
      |
      |export class UserService {
      |  private users: UserProps[] = [];
      |
      |  async findUser(id: number): Promise<UserProps> {
      |    return this.users.find(u => u.id === id);
      |  }
      |}
      |
      |export const formatName = (u: UserProps): string => {
      |  return u.name.trim();
      |};
      |""".stripMargin

  test("ts: interfaces, enums, typed methods and arrow functions") {
    val chunks = Chunker.chunkFile(rec("user.ts", "typescript", tsCode))
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("UserProps").chunk_type == "interface")
    assert(byName("UserProps").inherits_from == Seq("BaseProps"))
    assert(byName("Status").chunk_type == "enum")
    assert(byName("UserService").chunk_type == "class")
    assert(byName("findUser").chunk_type == "method")
    assert(byName("findUser").parent_name == "UserService")
    assert(byName("formatName").chunk_type == "function")
  }

  // ---- Rust (test_rust_parser.py) ------------------------------------

  private val rustCode =
    """use std::collections::HashMap;
      |
      |/// A user of the system.
      |#[derive(Debug, Clone)]
      |pub struct User {
      |    pub id: u64,
      |    pub name: String,
      |}
      |
      |pub enum Role {
      |    Admin,
      |    Member,
      |}
      |
      |pub trait Repository {
      |    fn find(&self, id: u64) -> Option<User>;
      |}
      |
      |impl User {
      |    /// Validates the user.
      |    pub fn validate(&self) -> bool {
      |        if self.name.is_empty() {
      |            return false;
      |        }
      |        self.id > 0 && !self.name.is_empty()
      |    }
      |
      |    pub fn rename(&mut self, name: String) {
      |        self.name = name;
      |    }
      |}
      |
      |impl Repository for User {
      |    fn find(&self, id: u64) -> Option<User> {
      |        None
      |    }
      |}
      |
      |pub fn create_user(id: u64, name: String) -> User {
      |    User { id, name }
      |}
      |""".stripMargin

  test("rust: struct/enum/trait/impl chunk types with impl target as parent") {
    val chunks = Chunker.chunkFile(rec("user.rs", "rust", rustCode))
    val types = chunks.map(_.chunk_type).toSet
    assert(Set("struct", "enum", "trait", "impl").subsetOf(types))
    val struct = chunks.find(_.chunk_type == "struct").get
    assert(struct.name == "User" && struct.language == "rust")
    assert(struct.decorators.contains("derive(Debug, Clone)"))
    val impls = chunks.filter(_.chunk_type == "impl")
    assert(impls.nonEmpty && impls.forall(_.name == "User"))
    // `impl Repository for User` records the trait
    assert(impls.exists(_.inherits_from == Seq("Repository")))
  }

  test("rust: fns inside impl are methods of the impl target; top-level fns are functions") {
    val chunks = Chunker.chunkFile(rec("user.rs", "rust", rustCode))
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("validate").chunk_type == "method")
    assert(byName("validate").parent_name == "User")
    assert(byName("validate").complexity > 1)
    assert(byName("validate").docstring == "Validates the user.")
    assert(byName("rename").chunk_type == "method")
    assert(byName("create_user").chunk_type == "function")
    assert(byName("create_user").return_type == "User")
    assert(byName("create_user").parameters == Seq("id: u64", "name: String"))
  }

  test("rust: empty file produces no chunks") {
    assert(Chunker.chunkFile(rec("empty.rs", "rust", "")).isEmpty)
  }

  // ---- Ruby (test_ruby_parser.py) ------------------------------------

  private val rubyCode =
    """require 'json'
      |
      |module Billing
      |  # Represents an invoice.
      |  class Invoice < Document
      |    attr_accessor :total
      |
      |    # Creates an invoice from a hash.
      |    def self.from_hash(data)
      |      new(data)
      |    end
      |
      |    def self.schema
      |      {}
      |    end
      |
      |    # True when fully paid.
      |    def paid?
      |      @total <= 0
      |    end
      |
      |    def finalize!
      |      @final = true
      |    end
      |
      |    def add_line(item, price)
      |      @total += price
      |    end
      |  end
      |
      |  class Receipt
      |    def print
      |      puts @total
      |    end
      |  end
      |end
      |""".stripMargin

  test("ruby: module/class/method/class_method chunks with ?/! names") {
    val chunks = Chunker.chunkFile(rec("billing.rb", "ruby", rubyCode))
    assert(chunks.count(_.chunk_type == "module") >= 1)
    assert(chunks.count(_.chunk_type == "class") >= 2)
    assert(chunks.count(_.chunk_type == "method") >= 3)
    val classMethods = chunks.filter(_.chunk_type == "class_method")
    assert(classMethods.map(_.name).toSet == Set("from_hash", "schema"))
    val special = chunks.filter(c => c.name.endsWith("?") || c.name.endsWith("!"))
    assert(special.length >= 2)
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("paid?").parent_name == "Invoice")
    assert(byName("paid?").docstring == "True when fully paid.")
    assert(byName("Invoice").inherits_from == Seq("Document"))
    assert(byName("Invoice").hierarchy_path == "Billing.Invoice")
    assert(byName("total").chunk_type == "attribute")
  }

  // ---- PHP (test_php_parser.py) --------------------------------------

  private val phpCode =
    """<?php
      |namespace App\Services;
      |
      |interface PaymentGateway
      |{
      |    public function charge(int $amount): bool;
      |}
      |
      |trait Loggable
      |{
      |    public function log(string $msg): void
      |    {
      |        echo $msg;
      |    }
      |}
      |
      |/**
      | * Handles order payments.
      | */
      |class PaymentService extends BaseService implements PaymentGateway
      |{
      |    use Loggable;
      |
      |    /**
      |     * Charge the given amount.
      |     */
      |    public function charge(int $amount): bool
      |    {
      |        if ($amount <= 0) {
      |            return false;
      |        }
      |        return true;
      |    }
      |
      |    public static function create(): self
      |    {
      |        return new self();
      |    }
      |
      |    private function audit(): void
      |    {
      |    }
      |}
      |
      |function format_amount(int $cents): string
      |{
      |    return sprintf("%.2f", $cents / 100);
      |}
      |
      |function parse_amount(string $s): int
      |{
      |    return (int) ($s * 100);
      |}
      |""".stripMargin

  test("php: class/interface/trait/method/function chunks with PHPDoc") {
    val chunks = Chunker.chunkFile(rec("pay.php", "php", phpCode))
    assert(chunks.count(_.chunk_type == "class") >= 1)
    assert(chunks.count(_.chunk_type == "interface") >= 1)
    assert(chunks.count(_.chunk_type == "trait") >= 1)
    assert(chunks.count(_.chunk_type == "method") >= 4)
    assert(chunks.count(c => c.chunk_type == "function") >= 2)
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("PaymentService").inherits_from.toSet ==
      Set("BaseService", "PaymentGateway"))
    assert(byName("PaymentService").docstring == "Handles order payments.")
    val charge = chunks.filter(c => c.name == "charge" &&
      c.parent_name == "PaymentService")
    assert(charge.nonEmpty && charge.head.docstring == "Charge the given amount.")
    assert(charge.head.return_type == "bool")
    assert(byName("format_amount").chunk_type == "function")
  }

  // ---- C# (parsers/csharp.py chunk types) ----------------------------

  private val csCode =
    """using System;
      |using System.Collections.Generic;
      |
      |namespace App.Models
      |{
      |    /// <summary>A registered user.</summary>
      |    [Serializable]
      |    public class User : EntityBase, IComparable
      |    {
      |        public int Id { get; set; }
      |
      |        public string Name { get; set; }
      |
      |        public User(int id, string name)
      |        {
      |            Id = id;
      |            Name = name;
      |        }
      |
      |        /// <summary>Validates the user.</summary>
      |        public bool Validate()
      |        {
      |            if (Id <= 0)
      |            {
      |                return false;
      |            }
      |            return !string.IsNullOrEmpty(Name);
      |        }
      |
      |        public async Task<List<User>> FindPeers(int max)
      |        {
      |            return new List<User>();
      |        }
      |    }
      |
      |    public interface IRepository
      |    {
      |        void Save(User user);
      |    }
      |
      |    public struct Point
      |    {
      |        public int X;
      |    }
      |
      |    public enum Status
      |    {
      |        Active,
      |        Inactive,
      |    }
      |}
      |""".stripMargin

  test("csharp: class/interface/struct/enum/method/constructor/property chunks") {
    val chunks = Chunker.chunkFile(rec("User.cs", "csharp", csCode))
    val byName = chunks.map(c => c.name -> c).toMap
    val userClass = chunks.find(c => c.chunk_type == "class" && c.name == "User").get
    assert(userClass.inherits_from.toSet == Set("EntityBase", "IComparable"))
    assert(userClass.decorators == Seq("Serializable"))
    assert(userClass.docstring.contains("A registered user"))
    assert(byName("IRepository").chunk_type == "interface")
    assert(byName("Point").chunk_type == "struct")
    assert(byName("Status").chunk_type == "enum")
    assert(byName("Validate").chunk_type == "method")
    assert(byName("Validate").parent_name == "User")
    assert(byName("Validate").return_type == "bool")
    assert(byName("FindPeers").chunk_type == "method")
    assert(byName("FindPeers").return_type == "Task")
    // constructor: method named like its class
    val ctor = chunks.filter(_.chunk_type == "constructor")
    assert(ctor.nonEmpty && ctor.head.name == "User")
    val props = chunks.filter(_.chunk_type == "property")
    assert(props.map(_.name).toSet == Set("Id", "Name"))
  }

  // ---- Dart (test_dart_parser.py) ------------------------------------

  private val dartCode =
    """import 'package:flutter/material.dart';
      |
      |/// A greeting card widget.
      |class GreetingCard extends StatelessWidget {
      |  final String name;
      |
      |  Widget build(BuildContext context) {
      |    return Text(name);
      |  }
      |}
      |
      |class CounterPage extends StatefulWidget {
      |  State<CounterPage> createState() => _CounterPageState();
      |}
      |
      |/// Plain model class.
      |class UserModel {
      |  final String id;
      |
      |  UserModel(this.id);
      |
      |  String describe(String prefix) {
      |    return prefix + id;
      |  }
      |}
      |
      |mixin Trackable on UserModel {
      |  void track() {}
      |}
      |
      |/// Fetches remote config.
      |Future<String> fetchConfig(String url) async {
      |  return url;
      |}
      |
      |int addNumbers(int a, int b) {
      |  return a + b;
      |}
      |
      |void logAll(List<String> items) {
      |  for (var item in items) {
      |    print(item);
      |  }
      |}
      |""".stripMargin

  test("dart: widget/class/mixin/function chunks with async and dartdoc") {
    val chunks = Chunker.chunkFile(rec("app.dart", "dart", dartCode))
    val widgets = chunks.filter(_.chunk_type == "widget")
    assert(widgets.length >= 2)
    assert(widgets.map(_.name).toSet == Set("GreetingCard", "CounterPage"))
    assert(chunks.count(_.chunk_type == "class") >= 1)
    assert(chunks.count(_.chunk_type == "mixin") >= 1)
    val functions = chunks.filter(_.chunk_type == "function")
    assert(functions.length >= 3)
    val byName = chunks.map(c => c.name -> c).toMap
    assert(byName("fetchConfig").content.contains("async"))
    assert(byName("fetchConfig").docstring == "Fetches remote config.")
    assert(byName("GreetingCard").docstring == "A greeting card widget.")
    assert(byName("GreetingCard").inherits_from.contains("StatelessWidget"))
    assert(byName("describe").chunk_type == "method")
    assert(byName("describe").parent_name == "UserModel")
    // UserModel(this.id) → constructor
    val ctor = chunks.filter(_.chunk_type == "constructor")
    assert(ctor.exists(_.name == "UserModel"))
    val docs = chunks.filter(_.docstring.nonEmpty)
    assert(docs.length >= 3)
  }
}
